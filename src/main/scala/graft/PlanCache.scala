package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, dir) memo of derived relations that several
  * operators (or several branches of one operator) re-derive
  * (cleaned ABR, blocked fuzzy matches, tf tables, packed bitsets).
  * Without it, a bench/verify run re-executes the shared lineage once
  * per consuming query; with it, the first consumer materializes the
  * relation into the block-manager cache and later consumers reuse
  * the InMemoryRelation.
  *
  * This is also the LIFECYCLE home for every persisted intermediate
  * in the operator library: operators never call bare `.persist()`
  * (which leaks the blocks for the session lifetime — nothing ever
  * unpersists them), they route through [[cached]] so `clear()` /
  * `invalidate(dir)` reclaims everything in one sweep at run end.
  * Entries must be deterministic functions of (dir); never cache raw
  * fact tables — only aggregated/derived relations an operator would
  * otherwise persist anyway.
  */
object PlanCache {
  private val cache = TrieMap.empty[(String, SparkSession, String), DataFrame]

  def cached(name: String, spark: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    // entries for stopped sessions are dead weight: their persisted
    // blocks are already gone with the session's block manager, and
    // keeping them would pin the SparkSession itself for the process
    // lifetime — evict them whenever the cache is touched
    cache.filterInPlace { case ((_, s, _), _) => !s.sparkContext.isStopped }
    cache.get((name, spark, dir)) match {
      case Some(df) => df
      case None =>
        val built = build.persist()
        // putIfAbsent (not getOrElseUpdate): two threads may race the
        // build — the loser's persisted plan must be unpinned, not
        // stranded in the block manager forever
        cache.putIfAbsent((name, spark, dir), built) match {
          case Some(winner) => built.unpersist(); winner
          case None => built
        }
    }
  }

  /** Drop (and unpersist) every entry cached under `dir` — call after
    * rewriting data in place, so later reads rebuild from the new
    * files instead of serving the stale persisted relation.
    */
  def invalidate(dir: String): Unit =
    cache.filterInPlace { case ((_, _, d), df) =>
      if (d == dir) { try df.unpersist() catch { case _: Exception => () }; false }
      else true
    }

  /** Unpersist and drop every cached plan — call when the data under
    * a cached dir changes, or between test suites. The cache is
    * otherwise intentionally process-lifetime: entries are one small
    * relation per (operator, session, dir).
    */
  def clear(): Unit = {
    cache.values.foreach(df =>
      try df.unpersist() catch { case _: Exception => () })
    cache.clear()
  }
}
