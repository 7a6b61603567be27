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

  /** Read JSONL with PERMISSIVE + columnNameOfCorruptRecord: well-
    * formed rows parse columnar, malformed rows carry their raw bytes
    * in the corrupt column. One scan, no driver involvement.
    */
  def readJsonlDocs(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(docSchema.add(StructField(corrupt, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(path)

  /** Clean rows only (parse succeeded AND the key survived). */
  def goodDocs(spark: SparkSession, path: String): DataFrame =
    readJsonlDocs(spark, path)
      .filter(col(corrupt).isNull && col("doc_id").isNotNull)
      .drop(corrupt)

  /** Quarantine: the raw line of every record that failed to parse
    * (or parsed without the required key), tagged with the reason —
    * replayable once the producer is fixed.
    */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    readJsonlDocs(spark, path)
      .filter(col(corrupt).isNotNull || col("doc_id").isNull)
      .select(
        coalesce(col(corrupt),
          to_json(struct(col("doc_id"), col("lang"), col("source"), col("text"))))
          .as("raw"),
        when(col(corrupt).isNotNull, "malformed_json")
          .otherwise("missing_doc_id").as("reason"))
}
