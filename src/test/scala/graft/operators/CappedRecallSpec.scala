package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.functions.BitsetMinhash

/** Round-10 capped-regime recall hardening, spec side (the measured
  * companion is RECALL_EVAL.json at forced-cap sf1):
  *
  *  - [[BitsetMinhash]] is a true minhash of the ngram bitset — the
  *    per-slot agreement fraction of a pair is an unbiased estimate
  *    of its BITSET jaccard (the similarity the exact scorer
  *    computes), so the banded catch curve 1−(1−s^r)^b transfers to
  *    measured candidate recall. The r9 regime borrowed word-shingle
  *    bands: a different similarity space, measured 0.434 recall at
  *    the 0.8 verify threshold against a quoted 0.983.
  *
  *  - [[Matching.impactCappedPairs]] champion-list truncation keeps
  *    every rare token's FULL posting list and guarantees K ≥ 1, so
  *    any query holding ANY corpus-shared token gets candidates —
  *    the r9 whole-token cheapest-first admit measured 0.485 query
  *    coverage on bm25's 40-token vocabulary.
  */
class CappedRecallSpec extends graft.SparkSpec {

  /** Deterministic bitset pair with exact jaccard inter/(2n−inter),
    * in the NgramBitset layout (32 bits used per long word).
    */
  private def bitsetPair(n: Int, inter: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val all = rnd.ints(0, 4096).distinct().limit(2L * n - inter)
      .toArray
    def pack(idxs: Array[Int]): Array[Long] = {
      val w = new Array[Long](128)
      for (i <- idxs) w(i / 32) |= 1L << (i % 32)
      w
    }
    (pack(all.take(n)), pack(all.takeRight(n)))
  }

  test("bitset minhash: slot agreement estimates bitset jaccard (the scorer's space)") {
    val k = Dedup.NgramLshBands * Dedup.NgramLshRows
    for ((n, inter, seed) <- Seq((300, 260, 1L), (300, 150, 2L), (800, 700, 3L))) {
      val (va, vb) = bitsetPair(n, inter, seed)
      val s = inter.toDouble / (2 * n - inter)
      val ma = BitsetMinhash.minhashSlots(va, k)
      val mb = BitsetMinhash.minhashSlots(vb, k)
      val agree = ma.zip(mb).count { case (x, y) => x == y }.toDouble / k
      // binomial σ = sqrt(s(1−s)/k) ≈ 0.025 at k=400 — 4σ band
      assert(math.abs(agree - s) < 0.1, f"agree=$agree%.3f vs s=$s%.3f")
    }
  }

  test("bitset minhash: deterministic, and equal sets always collide") {
    val (va, _) = bitsetPair(200, 100, 7L)
    val a1 = BitsetMinhash.bandKeys(new GenericArrayData(va),
      Dedup.NgramLshBands, Dedup.NgramLshRows).toLongArray()
    val a2 = BitsetMinhash.bandKeys(new GenericArrayData(va.clone()),
      Dedup.NgramLshBands, Dedup.NgramLshRows).toLongArray()
    assert(a1.toSeq == a2.toSeq)
    assert(a1.length == Dedup.NgramLshBands)
    // "equal sets collide": rebuild the SAME index set through a
    // different construction path (set bits in reverse order into a
    // fresh array) and assert every band key matches pairwise — a
    // band join on (band_idx, band_val) therefore collides this pair
    // in all 40 bands, which is the collision claim in the name.
    val idxs = (0 until 4096).filter(i => (va(i / 32) >> (i % 32) & 1L) == 1L)
    val vb = new Array[Long](va.length)
    for (i <- idxs.reverse) vb(i / 32) |= 1L << (i % 32)
    val b = BitsetMinhash.bandKeys(new GenericArrayData(vb),
      Dedup.NgramLshBands, Dedup.NgramLshRows).toLongArray()
    assert(b.toSeq == a1.toSeq,
      "independently built identical bitset must share every band key")
  }

  test("champion-list capped pairs: structural query coverage at any budget") {
    import spark.implicits._
    // 40 queries × 100 corpus docs on a 4-token vocabulary — the
    // bm25-at-sf1 failure shape in miniature
    val toks = Seq("alpha", "beta", "gamma", "delta")
    val left = (0L until 40L).flatMap(i =>
        toks.take(2 + (i % 3).toInt).map(t => (i, t, 1.0)))
      .toDF("id", "token", "imp")
    val right = (0L until 100L).flatMap(j =>
        toks.map(t => (j, t, 1.0 / (1 + (j + t.length) % 7))))
      .toDF("id", "token", "imp")
    val budget = 50.0 // far below the ~12k exact pairs
    val cand = Matching.impactCappedPairs(left, right, budget,
      gate = "spec.capped_k")
    val covered = cand.select("i").distinct().count()
    assert(covered == 40L,
      s"every query shares a token with the corpus; covered=$covered")
    val g = graft.GateLog.lastDecision("spec.capped_k", "-").get
    assert(g.chosen.startsWith("champion_k="), g.chosen)
  }

  test("champion-list capped pairs: admitted volume respects the budget when K>1 fits") {
    import spark.implicits._
    val left = (0L until 20L).map(i => (i, s"t${i % 5}", 1.0))
      .toDF("id", "token", "imp")
    val right = (0L until 200L).map(j => (j, s"t${j % 5}", j.toDouble))
      .toDF("id", "token", "imp")
    // exact volume = 5 tokens × 4 queries × 40 postings = 800
    val cand = Matching.impactCappedPairs(left, right, budget = 400.0,
      gate = "spec.capped_k2")
    assert(cand.count() <= 400L)
    // and the champion cut keeps the HIGHEST-impact postings: with
    // imp = j, every admitted corpus doc outranks every dropped one
    // within its token
    val minKept = cand.agg(min("j")).head().getLong(0)
    assert(minKept >= 100L, s"low-impact posting admitted: j=$minKept")
  }

  test("admitBudgetFor: depth floor is a CORPUS FRACTION per query, " +
      "and sampled call sites divide queries by the sample factor") {
    val base = 1e6
    // small vocab + reachable depth (4e6 / 1000 / 1000 = 4 >= 0.25)
    assert(Matching.admitBudgetFor(1000, base, 1000, 1000) == 4 * base)
    // small vocab, depth NOT reachable (0.04 < 0.25): keep base —
    // the sf10 lesson (scaling spend cannot buy argmax fidelity on a
    // near-tie corpus below the depth floor)
    assert(Matching.admitBudgetFor(1000, base, 100000, 1000) == base)
    // the SAME run 1-in-100 query-sampled reaches the floor: call
    // sites must pass nQueries/querySample (ADVICE r11: passing the
    // unsampled count understates depth by the sample factor)
    assert(Matching.admitBudgetFor(1000, base, 100000 / 100, 1000)
      == 4 * base)
    // wide vocab never scales regardless of depth
    assert(Matching.admitBudgetFor(10000, base, 10, 10) == base)
  }

  test("tfidf capped regime on a wide zipfy vocabulary: normalized " +
      "champion impact preserves coverage AND the argmax (canary for " +
      "the r11 sf10 coverage collapse)") {
    val dir = java.nio.file.Files
      .createTempDirectory("capped_names").toString
    graft.tools.RecallEval.writeNameCorpus(spark, dir, n = 400, vocab = 300)
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
      df.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = top1(Matching.matchTfidfTopk(spark, dir))
    assert(graft.GateLog.lastDecision("match_tfidf_topk.regime", dir)
      .exists(_.chosen != "capped"))
    // force the capped regime at a budget that truncates (4e4 exact
    // pairs > 1e4) — fidelity must survive a REAL champion cut
    val capped = top1(Matching.matchTfidfTopk(spark, dir,
      denseVocabMax = 4096, exactPairBudget = 1e4, admitPairBudget = 1e4))
    assert(graft.GateLog.lastDecision("match_tfidf_topk.regime", dir)
      .exists(_.chosen == "capped"))
    assert(exact.nonEmpty)
    val covered = exact.keySet.intersect(capped.keySet)
    assert(covered == exact.keySet,
      s"capped run lost ${exact.size - covered.size} of ${exact.size} queries")
    val agree = covered.count(i => capped(i)._1 == exact(i)._1)
    assert(agree == covered.size,
      s"argmax disagreement on ${covered.size - agree} queries")
    graft.PlanCache.invalidate(dir)
  }
}
