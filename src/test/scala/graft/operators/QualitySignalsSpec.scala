package graft.operators

import org.apache.spark.sql.functions._

/** Pins the fused quality-signal relation
  * ([[TextAnalysis.qualitySignals]]) to the joined two-source form it
  * replaced: the five Governance eval queries (AUC, PR curve,
  * reliability, kappa, confident joint) used to equi-join
  * qualityClassifier × textQuality on doc_id — an identity self-join,
  * since both signals project the same documents row. The fusion must
  * produce the EXACT (score, pos, keep) multiset of that join at a
  * real SF dir, or a consumer's aggregate could drift while staying
  * plausible.
  */
class QualitySignalsSpec extends graft.SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fused (score, pos, keep) multiset equals the classifier × quality join") {
    val fused = TextAnalysis.qualitySignals(spark, dir)
      .groupBy("score", "pos", "keep").agg(count(lit(1)).as("n"))

    val sc = TextAnalysis.qualityClassifier(spark, dir)
      .select(col("doc_id"), col("score"),
        when(col("verdict") === "keep", 1L).otherwise(0L).as("keep"))
    val tr = TextAnalysis.textQuality(spark, dir)
      .select(col("doc_id"),
        when(col("quality_bucket") === "ok", 1L).otherwise(0L).as("pos"))
    val joined = sc.join(tr, "doc_id")
      .groupBy("score", "pos", "keep").agg(count(lit(1)).as("n"))

    assert(fused.exceptAll(joined).isEmpty && joined.exceptAll(fused).isEmpty,
      "fused quality signals diverge from the joined two-source form")
    // the fixture is non-degenerate: both classes of both flags occur
    val flags = TextAnalysis.qualitySignals(spark, dir)
      .agg(sum("pos").as("p"), count(lit(1)).as("n"), sum("keep").as("k"))
      .head()
    assert(flags.getLong(0) > 0 && flags.getLong(0) < flags.getLong(1))
  }
}
