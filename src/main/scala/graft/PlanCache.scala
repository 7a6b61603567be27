package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, dir) memo of small derived relations that several
  * operators re-derive (cleaned ABR, blocked fuzzy matches). Without
  * it, a bench/verify run re-executes the shared lineage once per
  * consuming query; with it, the first consumer materializes the
  * relation into the block-manager cache and later consumers reuse
  * the InMemoryRelation. Only bounded outputs belong here (one row
  * per entity/customer) — never raw fact tables.
  */
object PlanCache {
  private val cache = TrieMap.empty[(String, SparkSession, String), DataFrame]

  def cached(name: String, spark: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((name, spark, dir), build.persist())
}
