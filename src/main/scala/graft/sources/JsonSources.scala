package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL document ingestion with an explicit quarantine path — the
  * web-corpus reality is that some fraction of every crawl dump is
  * malformed, and a pipeline must neither crash on it (FAILFAST) nor
  * silently null it away (default PERMISSIVE): bad lines land in a
  * quarantine output with the raw line preserved for replay, exactly
  * like Cleaning.cleanAbrRejects quarantines rule failures.
  * (Reference analog: extract_common_crawl.py's per-record
  * try/except skip — but with the skipped bytes kept.)
  */
object JsonSources {

  /** The corpus line schema. An EXPLICIT schema, never inferred:
    * schema inference is a full extra pass over the data (a non-
    * starter at 100 TB) and lets one bad dump drift the schema.
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("text", StringType)))

  private val corrupt = "_corrupt_record"

  /** Read as raw text lines and parse each with from_json: EVERY row
    * keeps its exact raw bytes alongside the parse result (a
    * schema'd JSON read would surrender the raw line the moment the
    * JSON parses, even when required fields are missing — losing
    * unknown fields the producer sent). One scan, no driver
    * involvement; malformed input marks the in-struct corrupt column
    * (PERMISSIVE from_json yields an otherwise-null struct, so a
    * null struct test can't distinguish malformed from all-null).
    */
  def readJsonlDocs(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(col("value").as("raw"),
        from_json(col("value"), docSchema.add(StructField(corrupt, StringType)),
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt))
          .as("doc"))

  /** Clean rows only (parse succeeded AND the key survived). */
  def goodDocs(spark: SparkSession, path: String): DataFrame =
    readJsonlDocs(spark, path)
      .filter(col(s"doc.$corrupt").isNull && col("doc.doc_id").isNotNull)
      .select(col("doc.doc_id").as("doc_id"), col("doc.lang").as("lang"),
        col("doc.source").as("source"), col("doc.text").as("text"))

  /** Quarantine: the EXACT raw line of every record that failed to
    * parse (or parsed without the required key), tagged with the
    * reason — byte-identical replay once the producer is fixed,
    * including fields outside [[docSchema]].
    */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    readJsonlDocs(spark, path)
      .filter(col(s"doc.$corrupt").isNotNull || col("doc.doc_id").isNull)
      .select(col("raw"),
        when(col(s"doc.$corrupt").isNotNull, "malformed_json")
          .otherwise("missing_doc_id").as("reason"))
}
