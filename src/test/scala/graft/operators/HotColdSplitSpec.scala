package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the hot/cold bucket split of the ngram family's LSH-candidate
  * regime to EXACTNESS: the claim at the join (Dedup.scala
  * lshCandidates — "buckets are entirely hot or cold, so the union is
  * exactly the full pair set") was argued, not spec-gated, until this
  * suite: the capped regime only engages above the 2e9 pair budget,
  * the oracle gates run in the exact regime, and RECALL_EVAL's forced
  * sf1 run predates the split. Here the regime AND the split are both
  * forced on the spec corpus, at thresholds that exercise every
  * branch:
  *
  *  - hotBucketMin = MaxValue → every bucket cold (the pure
  *    shuffle-hash pair join) — the baseline pair set;
  *  - hotBucketMin = 2 → every non-trivial bucket hot, broadcast
  *    self-join branch;
  *  - hotBucketMin = 2 AND hotBroadcastMaxBytes = 0 → every
  *    non-trivial bucket hot, salted self-join fallback branch
  *    (the r11 size-gated fallback);
  *  - hotBucketMin = median bucket size → a genuine MIXED split with
  *    boundary buckets sitting exactly at the threshold.
  *
  * All four must produce the SAME (i, j, jaccard) multiset — any
  * double-count (a pair in both halves) or boundary drop (a bucket in
  * neither) breaks set equality. Scores ride along so the verify join
  * downstream of the split is covered too.
  */
class HotColdSplitSpec extends graft.SparkSpec {

  /** Full capped-regime output at jaccard ≥ 0.5 under forced knobs. */
  private def capped(hotMin: Long, hotMax: Long): Seq[(Long, Long, Double)] =
    Dedup.ngramJaccardScores(spark, sf, minJaccard = 0.5,
        exactPairBudget = 1.0, hotBucketMin = hotMin,
        hotBroadcastMaxBytes = hotMax)
      .filter(col("jaccard") >= 0.5)
      .select("i", "j", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted

  /** Band-bucket sizes, read from the signature relation the capped
    * runs above already left in the PlanCache (the build body must
    * never evaluate — a cache miss here means the capped runs didn't
    * execute first).
    */
  private def bucketSizes(): Seq[Long] =
    graft.PlanCache.cached("ngram_lsh_sigs", spark, sf) {
      fail("ngram_lsh_sigs must already be cached by the capped run")
    }.select(col("lang"), posexplode(col("sig")).as(Seq("band_idx", "band_val")))
      .groupBy("lang", "band_idx", "band_val")
      .agg(count(lit(1)).as("bn"))
      .select("bn").collect().map(_.getLong(0)).toSeq

  test("hot ∪ cold = full pair set across all split regimes, including the salted fallback") {
    val allCold = capped(Long.MaxValue, Long.MaxValue)
    assert(allCold.nonEmpty, "spec corpus must produce candidate pairs")

    val allHotBroadcast = capped(2L, Long.MaxValue)
    assert(allHotBroadcast == allCold,
      s"broadcast hot branch diverged: ${allHotBroadcast.size} vs ${allCold.size} pairs")

    val allHotSalted = capped(2L, 0L)
    assert(allHotSalted == allCold,
      s"salted hot fallback diverged: ${allHotSalted.size} vs ${allCold.size} pairs")
    val gate = graft.GateLog.lastDecision("dedup_ngram_jaccard.hot_side", sf).get
    assert(gate.chosen == "salted_self_join", gate.chosen)

    // mixed split: threshold at the median bucket size puts real
    // buckets on BOTH sides, with at least one bucket exactly AT the
    // threshold (>= is the hot test, so that bucket must go hot and
    // only hot)
    val sizes = bucketSizes().sorted
    val mid = sizes(sizes.size / 2)
    val mixed = capped(mid, Long.MaxValue)
    assert(mixed == allCold,
      s"mixed split (hotMin=$mid) diverged: ${mixed.size} vs ${allCold.size} pairs")
  }
}
