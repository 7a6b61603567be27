package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Output sinks — the loading layer
  * (loading/loadingcsv_topostgre_optimized.py, entity_matching_tfidf
  * .py upsert_matches_to_postgres) re-expressed for a data lake:
  * partitioned columnar writes instead of row-batch INSERTs, and
  * merge-by-key compaction instead of ON CONFLICT upserts. Both scale
  * horizontally — the writer shuffles once on the partition key, the
  * merge once on the merge key.
  */
object Sinks {

  /** Partitioned parquet write: one directory per key value, files
    * sized by pre-repartitioning on the partition columns (the
    * loader's batching, minus the driver bottleneck).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       filesPerPartition: Int = 1): Unit =
    df.repartition(filesPerPartition, partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Latest-wins keyed merge: rows from `updates` replace rows in
    * `base` with the same key when their version orders higher —
    * the distributed form of the reference's
    * `ON CONFLICT DO UPDATE ... WHERE confidence < EXCLUDED` upsert.
    * One shuffle on the key; deterministic tiebreak on provenance
    * (updates beat base at equal version).
    */
  def upsertLatestWins(base: DataFrame, updates: DataFrame,
                       keyCols: Seq[String], versionCol: String): DataFrame = {
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }

  /** Range-partitioned, sorted parquet write: the data-lake analog of
    * the reference loader's CREATE INDEX step
    * (loadingcsv_topostgre_optimized.py optimize_table) — sorting by
    * the filter keys tightens parquet row-group min/max stats so
    * selective scans skip row groups instead of probing a btree.
    */
  def writeSortedForPruning(df: DataFrame, path: String, sortCols: Seq[String],
                            partitions: Int = 8): Unit =
    df.repartitionByRange(partitions, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** CSV write+read round-trip with an explicit schema — the
    * reference's CSV interchange format, kept schema-stable.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
}
