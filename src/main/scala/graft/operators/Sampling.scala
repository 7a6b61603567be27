package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic corpus sampling for training-data curation.
  *
  * `rand()`-based sampling is unstable under retries, re-partitioning
  * and speculative execution — a re-run selects a different corpus.
  * Hash-threshold sampling (keep a row iff a uniform hash of its
  * CONTENT falls under the rate) is reproducible across runs and
  * engines, deduplicates for free (identical texts share a fate), and
  * needs no shuffle — it is a map-side filter that fuses into the
  * scan at any scale.
  */
object Sampling {

  /** Stratified hash sampling: per-language target rates (en kept at
    * 50%, the long tail at 10% — the up/down-sampling mix used when
    * rebalancing a multilingual corpus). Output is every kept doc
    * with its hash, so downstream stages can re-threshold WITHOUT
    * rescanning: any rate r' < r is a filter on `u`.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    // native codegen'd hex-prefix hash (graft_hex_long) — the
    // interpreted aggregate-lambda formulation costs ~10x per row
    val d = Tables.documents(spark, dir)
      .withColumn("u", graft.functions.HexExprs.uniformHash(col("text")))
      .withColumn("rate", when(col("lang") === "en", 0.5).otherwise(0.1))
    d.filter(col("u") < col("rate"))
      .select(col("doc_id"), col("lang"), round(col("u"), 6).as("u"))
      .orderBy("doc_id")
  }
}
