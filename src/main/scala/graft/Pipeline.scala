package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Cleaning, Dedup, Matching, Quality, Sampling, TextAnalysis}
import graft.sources.Sinks

/** End-to-end pipeline composition — the graft equivalent of the
  * reference's Airflow DAG (dags/etl_pipeline.py: extract →
  * create_schema → clean → load → match). Here every stage is a
  * DataFrame transform, so "orchestration" is function composition
  * and the whole flow optimizes as one lazy plan per sink; stage
  * boundaries exist only where results are written.
  */
object Pipeline {

  case class StageResult(name: String, rows: Long, seconds: Double)

  /** Run clean → match → quality over a testdata dir, writing each
    * stage's output as partitioned parquet under outDir. Returns
    * per-stage row counts and timings (the DAG's per-stage logs).
    */
  def run(spark: SparkSession, dir: String, outDir: String): Seq[StageResult] = {
    def stage(name: String, df: => DataFrame, partitionCols: Seq[String] = Nil): StageResult = {
      val t0 = System.nanoTime()
      val out = df
      if (partitionCols.nonEmpty) Sinks.writePartitioned(out, s"$outDir/$name", partitionCols)
      else out.write.mode("overwrite").parquet(s"$outDir/$name")
      val rows = spark.read.parquet(s"$outDir/$name").count()
      StageResult(name, rows, (System.nanoTime() - t0) / 1e9)
    }
    Seq(
      stage("abr_cleaned", Cleaning.cleanAbr(spark, dir)),
      stage("cc_cleaned", Cleaning.cleanCc(spark, dir)),
      stage("entity_matches", Matching.matchCombined(spark, dir), Seq("method")),
      stage("quality_metrics", Quality.qualityMetrics(spark, dir), Seq("table_name")))
  }

  /** The LLM-training-data curation flow over the documents corpus:
    * quality-score → near-dup components → keeper election →
    * stratified sample — each stage parquet-materialized so a failed
    * stage restarts from its input, not the source (the reference DAG's
    * retry-per-task property, without the driver orchestration).
    */
  def runCuration(spark: SparkSession, dir: String, outDir: String): Seq[StageResult] = {
    def stage(name: String, df: => DataFrame): StageResult = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      val rows = spark.read.parquet(s"$outDir/$name").count()
      StageResult(name, rows, (System.nanoTime() - t0) / 1e9)
    }
    Seq(
      stage("doc_quality", TextAnalysis.textQuality(spark, dir)),
      stage("dup_components", Dedup.dedupComponents(spark, dir)),
      stage("sampled", Sampling.sampleStratified(spark, dir)))
  }
}
