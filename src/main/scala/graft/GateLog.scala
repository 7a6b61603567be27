package graft

import scala.collection.concurrent.TrieMap

/** Measured-gate decision log. Every operator that picks a physical
  * regime from measured stats (dense vs sparse scoring, broadcast vs
  * shuffle side, exact vs capped candidates) records the decision
  * here: one stderr line per decision so a bench/verify log shows
  * WHICH regime each query actually ran — the r8 sf1 sweep lost a
  * silently-flipped broadcast gate for lack of exactly this — plus an
  * in-memory last-decision map that specs pin against synthetic
  * sf1-shaped stats and the PLANS dump includes next to each head.
  *
  * Keyed by (gate, dir) so the same operator run at two scale factors
  * keeps both decisions visible.
  */
object GateLog {
  final case class Decision(gate: String, dir: String, chosen: String,
                            detail: String)

  private val last = TrieMap.empty[(String, String), Decision]

  def decide(gate: String, dir: String, chosen: String, detail: String): Unit = {
    val d = Decision(gate, dir, chosen, detail)
    last.put((gate, dir), d)
    System.err.println(s"[gate] $gate dir=$dir chosen=$chosen $detail")
  }

  /** Last decision for a gate under `dir` (specs + PLANS dump). */
  def lastDecision(gate: String, dir: String): Option[Decision] =
    last.get((gate, dir))

  /** All decisions recorded under `dir`, gate-name-sorted. */
  def decisionsFor(dir: String): Seq[Decision] =
    last.values.filter(_.dir == dir).toSeq.sortBy(_.gate)

  def clear(): Unit = last.clear()
}
