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

  // --- consumer-aware release (the sf10 scratch-disk valve) ---
  // A full-registry sweep at sf10 accumulates ~70 GB of LIVE persisted
  // family caches whose consumers have all already run (r11: 4 ENOSPC
  // kills + the graph family's disk-thrash exponent). Bench tags each
  // registry query as the current consumer; every cached() touch
  // records (cache name → consumers, last-touch epoch), and
  // [[releaseAfter]] unpersists entries that provably (census) or
  // heuristically (idle, under measured disk pressure) have no
  // remaining consumer. A wrong eviction is a recompute, never a
  // correctness event — cached() just rebuilds.
  @volatile private var consumer: String = ""
  @volatile private var epoch: Int = 0
  private val touchedBy = TrieMap.empty[String, Set[String]]
  private val lastTouch = TrieMap.empty[(String, SparkSession, String), Int]

  /** Tag subsequent cached() touches with the registry query that
    * caused them (Bench's census + timing loops). `e` orders entries
    * by recency for the idle-eviction heuristic.
    */
  def beginConsumer(q: String, e: Int): Unit = { consumer = q; epoch = e }

  /** Snapshot of cache-name → consumer-query names seen so far — the
    * census Bench harvests after its sf0.001 plan-build pass.
    */
  def consumersSeen: Map[String, Set[String]] = touchedBy.toMap

  /** Unpersist (and drop) entries under `dir` with no remaining
    * consumer: proactively when the census knows the entry's full
    * consumer set and every consumer already ran; under measured
    * scratch-disk pressure also entries the census never saw
    * (SF-dependent regime caches) that have sat idle ≥ `idleEpochs`
    * queries. Returns the evicted names for the bench log.
    */
  def releaseAfter(dir: String, ran: Set[String],
      census: Map[String, Set[String]], pressure: Boolean,
      idleEpochs: Int = 2): Seq[String] = {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    cache.filterInPlace { case (k @ (name, _, d), df) =>
      val drop = d == dir && {
        val consumers = census.getOrElse(name, Set.empty) ++
          touchedBy.getOrElse(name, Set.empty)
        val allRan = census.contains(name) && consumers.subsetOf(ran)
        // entries with a census-known FUTURE consumer are the last
        // resort under pressure (8x the idle floor — evicting them
        // trades a known rebuild for disk headroom); census-unknown
        // entries evict at the floor
        val hasFuture = census.contains(name) && !consumers.subsetOf(ran)
        val floor = if (hasFuture) idleEpochs * 8 else idleEpochs
        val idle = pressure &&
          epoch - lastTouch.getOrElse(k, epoch) >= floor
        allRan || idle
      }
      if (drop) {
        try df.unpersist() catch { case _: Exception => () }
        lastTouch.remove(k)
        evicted += name
      }
      !drop
    }
    evicted.toSeq
  }

  private def recordTouch(key: (String, SparkSession, String)): Unit =
    if (consumer.nonEmpty) {
      touchedBy.updateWith(key._1) {
        case Some(s) => Some(s + consumer)
        case None => Some(Set(consumer))
      }
      lastTouch.put(key, epoch)
    }

  def cached(name: String, spark: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    // entries for stopped sessions are dead weight: their persisted
    // blocks are already gone with the session's block manager, and
    // keeping them would pin the SparkSession itself for the process
    // lifetime — evict them whenever the cache is touched
    cache.filterInPlace { case ((_, s, _), _) => !s.sparkContext.isStopped }
    val key = (name, spark, dir)
    recordTouch(key)
    cache.get(key) match {
      case Some(df) => df
      case None =>
        val built = build.persist()
        // putIfAbsent (not getOrElseUpdate): two threads may race the
        // build — the loser's persisted plan must be unpinned, not
        // stranded in the block manager forever
        cache.putIfAbsent(key, built) match {
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
    cache.filterInPlace { case (k @ (_, _, d), df) =>
      if (d == dir) {
        try df.unpersist() catch { case _: Exception => () }
        lastTouch.remove(k); false
      }
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
    lastTouch.clear()
  }
}
