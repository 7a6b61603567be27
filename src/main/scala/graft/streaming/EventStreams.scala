package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the batch event operators: the same
  * semantics expressed over an unbounded source, so the engine covers
  * the reference pipeline's incremental-run shape (Airflow re-runs →
  * continuous processing) without re-reading history.
  *
  * Tested with MemoryStream in StreamingSpec — no external broker in
  * this environment, and the operators only see a DataFrame, so any
  * source (kafka/files/rate) plugs in unchanged.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionUpdate(user_id: Long, session_start: Long,
                           n_events: Long, sum_value: Double)

  /** public: the state encoder's generated code must reach it. */
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)

  /** Watermarked tumbling-window counts per event type — the
    * streaming form of Events.eventsHourly. Late data beyond 10
    * minutes is dropped by the watermark, bounding state.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming A/B experiment monitor: purchases split into variants
    * by the SAME deterministic content-hash assignment as the batch
    * [[graft.operators.Events.eventsAbTest]], with per-variant
    * running revenue moments (n, Σv, Σv²) maintained incrementally —
    * the live dashboard row an experimentation platform refreshes per
    * micro-batch while the batch read-out is the end-of-day truth.
    * Purchase-EVENT moments (not per-user): a streaming two-level
    * aggregate (user rollup → variant rollup) would need chained
    * stateful aggregations; the event-level moments are the standard
    * online proxy and are exactly reconcilable against batch on the
    * same data (StreamingSpec pins it).
    *
    * State is two rows (one per variant) — constant regardless of
    * stream length; the aggregation is map-side-combined per batch.
    */
  def abMonitor(events: Dataset[Event]): DataFrame =
    events.toDF()
      .filter(col("event_type") === "purchase")
      .withColumn("variant",
        when(graft.functions.HexExprs.uniformHash(col("user_id").cast("string")) < 0.5,
          "A").otherwise("B"))
      .groupBy("variant")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum("value"), 6).as("revenue"),
        round(sum(col("value") * col("value")), 6).as("revenue_sq"))

  /** Streaming exact dedup by event id: state bounded by the
    * watermark horizon (duplicates arriving later than 1 hour are
    * outside the contract and pass through).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Incremental keyed upsert: every micro-batch merges into a keyed
    * parquet table with latest-wins semantics — the streaming form of
    * the reference loader's ON CONFLICT upsert
    * (entity_matching_tfidf.py upsert_matches_to_postgres), via
    * foreachBatch + Sinks.upsertLatestWins.
    */
  def incrementalUpsert(events: Dataset[Event], tablePath: String,
                        checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = events.sparkSession
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Event], _: Long) =>
        val updates = batch.toDF()
          .groupBy("user_id")
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.struct("ts", "event_id", "event_type", "value")).as("m"))
          .select(col("user_id"), col("m.ts").as("ts"), col("m.event_id").as("event_id"),
            col("m.event_type").as("event_type"), col("m.value").as("value"))
        val base =
          if (new java.io.File(tablePath).exists()) spark.read.parquet(tablePath)
          else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            updates.schema)
        val merged = graft.sources.Sinks.upsertLatestWins(base, updates, Seq("user_id"), "ts")
        // write to a temp dir then swap: the merge reads the same path
        val tmp = tablePath + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val (dst, src) = (new java.io.File(tablePath), new java.io.File(tmp))
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        if (dst.exists()) rm(dst)
        src.renameTo(dst)
        ()
      }
      .start()
  }

  /** public: the state encoder's generated code must reach it. */
  case class KmvSketch(hashes: List[Double])

  case class DistinctEstimate(event_type: String, approx_users: Double)

  /** Streaming KMV distinct-count: per event type, keep the k
    * smallest content hashes of user ids in state (constant-size per
    * group — unlike exact streaming countDistinct, whose state grows
    * with cardinality forever) and emit the updated estimate each
    * batch. The batch twin is operators.Sketches.approxDistinctKmv;
    * same estimator, same deterministic md5-uniform hash.
    */
  def kmvDistinctUsers(events: Dataset[Event], k: Int = 32): Dataset[DistinctEstimate] = {
    import events.sparkSession.implicits._
    def uhash(v: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[KmvSketch, DistinctEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[Event], state: GroupState[KmvSketch]) =>
          val cur = state.getOption.map(_.hashes).getOrElse(Nil)
          val merged = (cur ++ rows.map(e => uhash(e.user_id)))
            .distinct.sorted.take(k)
          state.update(KmvSketch(merged))
          val est =
            if (merged.size < k) merged.size.toDouble
            else (k - 1).toDouble / merged.last
          Iterator(DistinctEstimate(etype, math.round(est * 1e6) / 1e6))
      }
  }

  /** Watermarked stream-stream interval join: each purchase joined to
    * the same user's signup events from the preceding hour. Both
    * sides carry watermarks and the join predicate bounds the time
    * skew, so the engine can evict buffered rows once the watermark
    * passes the interval — bounded state on unbounded inputs, the
    * streaming twin of the batch range/as-of joins.
    */
  def purchaseSignupJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_event"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", "10 minutes")
    purchases.join(signups,
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_event"), col("p_user").as("user_id"), col("s_event"),
        ((col("p_ts").cast("long")) - col("s_ts").cast("long")).as("gap_s"))
  }

  /** Streaming decontamination gate: an unbounded document stream
    * checked against a STATIC benchmark 5-gram set, flagging docs that
    * share >= minShared grams — the SAME threshold semantics as the
    * batch twin [[graft.operators.Dedup.contaminationNgram]], so a doc
    * gets the same verdict whichever ingestion path it takes. Each doc
    * arrives whole, so the shared-gram count is a per-ROW map-side
    * computation (array_intersect against the benchmark set inlined as
    * a literal). The literal (and its generated code) grows with the
    * benchmark set, so the collect is HARD-CAPPED at maxInlineGrams —
    * the gate fails fast at build time instead of silently blowing the
    * driver or the 64KB codegen method limit mid-stream. A suite past
    * the cap ships as a Bloom-filter broadcast instead
    * ([[contaminationGateBloom]]), trading exactness at the threshold
    * for constant size. No streaming aggregation state at all; the
    * per-doc flag dedup rides the watermark, keeping state bounded.
    * Emits each contaminated doc once with its shared-gram count.
    */
  def contaminationGate(docs: DataFrame, benchGramHashes: DataFrame,
                        minShared: Int = 3,
                        maxInlineGrams: Int = 200000): DataFrame = {
    // bound the driver collect BEFORE collecting: limit(cap+1) pulls
    // at most cap+1 rows even when the benchmark table is huge
    val bench = benchGramHashes.select("h").limit(maxInlineGrams + 1)
      .collect().map(_.getString(0)).toSeq
    require(bench.size <= maxInlineGrams,
      s"benchmark gram set exceeds maxInlineGrams=$maxInlineGrams; " +
        "use contaminationGateBloom (broadcast Bloom filter) for large eval suites")
    docs
      .withWatermark("ts", "10 minutes")
      .withColumn("t", split(col("text"), "\\s+"))
      .filter(size(col("t")) >= 5)
      .withColumn("hs", array_distinct(expr(
        "transform(sequence(1, size(t)-4), i -> md5(array_join(slice(t, i, 5), ' ')))")))
      .withColumn("n_shared", size(array_intersect(col("hs"), typedLit(bench))))
      .filter(col("n_shared") >= minShared)
      .select("doc_id", "ts", "n_shared")
      .dropDuplicatesWithinWatermark("doc_id")
  }

  /** Web-scale form of [[contaminationGate]]: the benchmark gram set
    * ships as a broadcast Bloom filter (constant ~`1.2·n·ln(1/fpp)/8`
    * bytes regardless of gram width) instead of an inlined literal.
    * The probe is a per-row map-side filter over the doc's gram
    * hashes — still no streaming aggregation state. Bloom filters
    * have false POSITIVES only, so the gate is a guaranteed SUPERSET
    * of the exact gate: `n_maybe_shared >= n_shared` per doc, no
    * contaminated doc is ever missed, and flagged docs feed the exact
    * batch verifier ([[graft.operators.Dedup.contaminationNgram]])
    * downstream — the standard sketch-then-verify decontamination
    * shape. The probe is a deterministic Scala function over the
    * broadcast sketch (justified non-codegen: Spark's BloomFilter has
    * no Column-level mightContain), applied inside `filter(hs, ...)`
    * so only the array lambda is interpreted, not the row pipeline.
    */
  def contaminationGateBloom(docs: DataFrame, benchGramHashes: DataFrame,
                             minShared: Int = 3,
                             expectedGrams: Long = 1L << 20,
                             fpp: Double = 0.01): DataFrame = {
    val bf = benchGramHashes.stat.bloomFilter("h", expectedGrams, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((h: String) => bc.value.mightContainString(h))
    docs
      .withWatermark("ts", "10 minutes")
      .withColumn("t", split(col("text"), "\\s+"))
      .filter(size(col("t")) >= 5)
      .withColumn("hs", array_distinct(expr(
        "transform(sequence(1, size(t)-4), i -> md5(array_join(slice(t, i, 5), ' ')))")))
      .withColumn("n_maybe_shared",
        size(filter(col("hs"), h => mightContain(h))))
      .filter(col("n_maybe_shared") >= minShared)
      .select("doc_id", "ts", "n_maybe_shared")
      .dropDuplicatesWithinWatermark("doc_id")
  }

  /** Streaming PII scrub: the privacy gate applied ON INGEST, so raw
    * identifiers never reach the lake — redacted text plus per-kind
    * hit counts per doc. Stateless (pure map-side regex work via the
    * SAME [[graft.operators.TextAnalysis.piiCounts]]/
    * [[graft.operators.TextAnalysis.piiRedact]] detectors as the
    * batch operator, so batch and stream provably agree) — no
    * watermark, no state store; the stream stays append-mode and the
    * whole transform fuses into the source's project.
    */
  def piiScrubStream(docs: DataFrame): DataFrame =
    docs.select(
      Seq(col("doc_id"), col("ts"),
        graft.operators.TextAnalysis.piiRedact(col("text")).as("text")) ++
        graft.operators.TextAnalysis.piiCounts(col("text")): _*)

  case class StreamHealth(batches: Long, inputRows: Long,
                          droppedByWatermark: Long, stateRows: Long,
                          maxBatchDurationMs: Long)

  /** Operational health summary of a running streaming query, read
    * from the engine's own progress telemetry: batches processed,
    * input rows, rows DROPPED BY THE WATERMARK (the silent data-loss
    * channel every watermarked pipeline must monitor — a growing
    * count means the lateness bound is wrong for the source),
    * current state-store rows (the bounded-state invariant, observed
    * rather than assumed), and worst batch duration (backpressure
    * signal). Pure driver-side accounting over `recentProgress` —
    * nothing touches the stream itself.
    */
  def streamHealth(q: org.apache.spark.sql.streaming.StreamingQuery): StreamHealth = {
    val ps = q.recentProgress
    val stateOps = ps.flatMap(p => Option(p.stateOperators).toSeq.flatten)
    StreamHealth(
      batches = ps.length,
      inputRows = ps.map(_.numInputRows).sum,
      droppedByWatermark = stateOps.map(_.numRowsDroppedByWatermark).sum,
      stateRows = ps.lastOption
        .map(p => Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal).sum)
        .getOrElse(0L),
      maxBatchDurationMs = ps.map(_.batchDuration).foldLeft(0L)(math.max))
  }

  /** The streaming CURATION pipeline — the end-to-end ingest gate a
    * training-data lake runs on every arriving document, composed
    * from this module's stages so each is individually
    * batch-reconciled: (1) PII redaction ON INGEST
    * ([[piiScrubStream]] — raw identifiers never reach the lake),
    * (2) a stateless quality gate (the batch textQuality rules:
    * ≥ 20 tokens, stopword ratio ≤ 0.3 — pure map-side arithmetic),
    * (3) streaming exact CONTENT dedup
    * (`dropDuplicatesWithinWatermark` on md5 of the redacted text —
    * state bounded by the watermark horizon; re-crawled boilerplate
    * collapses to its first arrival). Append-mode throughout: the
    * only state is the dedup hash set inside the watermark window.
    */
  def curationStream(docs: DataFrame): DataFrame = {
    val scrubbed = piiScrubStream(docs)
    val stop = Seq("the", "a", "or", "and")
    scrubbed
      .withColumn("t", split(col("text"), "\\s+"))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("stop_ratio",
        round(expr(s"size(filter(t, x -> x IN (${stop.map("'" + _ + "'").mkString(",")})))")
          .cast("double") / col("n_tokens"), 6))
      .filter(col("n_tokens") >= 20 && col("stop_ratio") <= 0.3)
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("text_hash")
      .select("doc_id", "ts", "text", "text_hash", "n_tokens", "stop_ratio")
  }

  /** Streaming Count-Min sketch: the running d=4 × w=256 bucket-sum
    * table over the token stream — the streaming face of
    * [[graft.operators.Sketches.heavyHittersCms]], with the SAME
    * bucket derivation (first 2 md5 hex chars of "row|token"), so a
    * batch probe of the streamed sketch answers the same frequency
    * queries. The aggregation state is the sketch itself: at most
    * d·w = 1024 keys REGARDLESS of stream volume or vocabulary — the
    * point of CMS — so this needs no watermark to stay bounded.
    */
  def cmsSketchStream(docs: DataFrame, d: Int = 4): DataFrame =
    graft.operators.Sketches.cmsBuckets(
        docs.select(explode(split(col("text"), "\\s+")).as("token")), d)
      .groupBy("row", "bucket").agg(count(lit(1)).as("bsum"))

  /** 30-minute-gap sessionization with explicit state — the
    * streaming form of Events.eventsSessionize. Emits a session row
    * every time a gap closes one. State is keyed per user and
    * constant-size; an idle session stays open until that user's
    * next event (a timeout-based flush would add emission on idle,
    * at the cost of timeout-driven re-batching).
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionUpdate]
          sorted.foreach { e =>
            val tsSec = e.ts.getTime / 1000
            cur match {
              case Some(s) if tsSec - s.lastTs > 1800 =>
                closed += SessionUpdate(userId, s.start, s.n, s.total)
                cur = Some(SessionState(tsSec, tsSec, 1, e.value))
              case Some(s) =>
                cur = Some(s.copy(lastTs = tsSec, n = s.n + 1, total = s.total + e.value))
              case None =>
                cur = Some(SessionState(tsSec, tsSec, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Declarative sessionization: the built-in session_window gap
    * aggregation (watermark-bounded state, merged by Spark's
    * SessionWindowStateStore) — the plan-level counterpart of
    * [[sessionize]]'s explicit state machine. Prefer this form when
    * the per-session result is a plain aggregate (count/sum/min/max):
    * it gets map-side partial merges and needs no user code in the
    * hot path; drop to flatMapGroupsWithState only for session logic
    * an aggregate can't express. Emits on watermark close.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start"),
        col("session_window.end").cast("long").as("session_end"),
        col("n_events"), col("total_value"))

  /** public: the state encoder's generated code must reach it. */
  case class WelfordState(n: Long, mean: Double, m2: Double)

  case class AnomalyScore(event_id: Long, event_type: String, value: Double,
                          z: Double, is_anomaly: Boolean)

  /** Online per-type anomaly scoring — the streaming twin of
    * Events.eventsZscore, without ever seeing the full history: state
    * per event type is a constant-size Welford (n, mean, M2) triple,
    * so variance is tracked in one numerically-stable pass (no
    * sum-of-squares cancellation). Each event is scored against the
    * state BEFORE it updates it (causal score — an outlier can't
    * deflate its own z), and flagging waits for a 30-event burn-in
    * per key so early noise can't alarm. Within a micro-batch, events
    * apply in (ts, event_id) order for replay determinism.
    */
  def anomalyScoreStream(events: Dataset[Event], zThresh: Double = 3.0): Dataset[AnomalyScore] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[WelfordState, AnomalyScore](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[Event], state: GroupState[WelfordState]) =>
          var s = state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0))
          val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            val std = if (s.n >= 2) math.sqrt(s.m2 / (s.n - 1)) else 0.0
            val z = if (std > 0) (e.value - s.mean) / std else 0.0
            val flag = s.n >= 30 && math.abs(z) > zThresh
            val n1 = s.n + 1
            val d = e.value - s.mean
            val mean1 = s.mean + d / n1
            s = WelfordState(n1, mean1, s.m2 + d * (e.value - mean1))
            AnomalyScore(e.event_id, etype, e.value, z, flag)
          }
          state.update(s)
          out.iterator
      }
  }

  /** public: the state encoder's generated code must reach it. */
  case class HitterEstimate(shard: Int, user_id: Long, est: Long)

  /** Sharded Misra-Gries streaming heavy hitters: per shard
    * (user_id mod `shards`), state is AT MOST `m` (user, counter)
    * entries regardless of stream length — the frequent-items
    * guarantee (any user with true count > n_shard/(m+1) is present,
    * and est ≤ true ≤ est + total decrements) survives sharding
    * because each user lives in exactly one shard. Each trigger emits
    * the shard's current summary; a batch consumer unions the shard
    * summaries for the global view — the sketch is mergeable, which
    * is what makes this scale: no single task ever sees the whole
    * stream, unlike a naive "groupBy the constant" top-k.
    * Within a micro-batch events apply in (ts, event_id) order, and
    * counters decrement in deterministic key order, so replays agree.
    */
  def heavyHittersStream(events: Dataset[Event], m: Int = 16,
                         shards: Int = 8): Dataset[HitterEstimate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (math.floorMod(e.user_id, shards.toLong)).toInt)
      .flatMapGroupsWithState[Map[Long, Long], HitterEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[Event], state: GroupState[Map[Long, Long]]) =>
          var ctr = state.getOption.getOrElse(Map.empty[Long, Long])
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val u = e.user_id
            if (ctr.contains(u)) ctr = ctr.updated(u, ctr(u) + 1L)
            else if (ctr.size < m) ctr = ctr.updated(u, 1L)
            else ctr = ctr.iterator
              .map { case (k, c) => (k, c - 1L) }
              .filter(_._2 > 0L).toMap
          }
          state.update(ctr)
          ctr.toSeq.sortBy(_._1)
            .map { case (u, c) => HitterEstimate(shard, u, c) }.iterator
      }
  }

  /** public: the state encoder's generated code must reach it. */
  case class PendingView(viewTs: Long, viewId: Long)

  case class Conversion(user_id: Long, view_event: Long,
                        purchase_event: Long, latency_s: Long)

  /** Streaming pattern detection (CEP): emit a conversion when a
    * purchase follows the SAME user's most recent view within
    * `windowS` seconds — the view→purchase funnel as an online
    * detector instead of a batch rollup. State per user is ONE
    * fixed-size (ts, id) pair: a new view replaces the pending one
    * (last-touch semantics, matching the batch
    * [[graft.operators.Events.eventsAttribution]]), a qualifying
    * purchase consumes it (one conversion per view — a double
    * purchase can't double-credit), a purchase past the window
    * deadline clears it, and a purchase that PREDATES the view
    * (late/out-of-order delivery across micro-batches) leaves it
    * intact — stale data must not cancel a still-valid view.
    *
    * State is bounded by EVENT-TIME TIMEOUT, not just by event flow:
    * a pending view whose conversion deadline (viewTs + windowS)
    * falls behind the watermark can never convert — any qualifying
    * purchase would itself be late beyond the watermark and dropped
    * — so the state is evicted. That keeps state O(recently active
    * users), not O(all users ever seen), on an unbounded stream.
    * `lateS` is the watermark delay (how long out-of-order events are
    * accepted); within a micro-batch events apply in (ts, event_id)
    * order so replays are deterministic.
    */
  def conversionDetect(events: Dataset[Event], windowS: Long = 1800,
                       lateS: Long = 1800): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$lateS seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PendingView, Conversion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[PendingView]) =>
          if (state.hasTimedOut) {
            // watermark passed the pending view's conversion deadline:
            // no on-time purchase can consume it — drop the state
            state.remove()
            Iterator.empty
          } else {
            var pending = state.getOption
            val out = Seq.newBuilder[Conversion]
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime / 1000
              e.event_type match {
                case "view" => pending = Some(PendingView(t, e.event_id))
                case "purchase" =>
                  pending match {
                    case Some(p) if t >= p.viewTs && t - p.viewTs <= windowS =>
                      out += Conversion(uid, p.viewId, e.event_id, t - p.viewTs)
                      pending = None
                    case Some(p) if t - p.viewTs > windowS =>
                      pending = None // aged past the window: expire it
                    case _ => () // predates the view, or no view: no-op
                  }
                case _ => ()
              }
            }
            pending match {
              case Some(p) =>
                state.update(p)
                // evict once the watermark passes the deadline; the
                // timeout must sit strictly ahead of the current
                // watermark or Spark rejects it
                val deadlineMs = (p.viewTs + windowS) * 1000L + 1000L
                state.setTimeoutTimestamp(
                  math.max(deadlineMs, state.getCurrentWatermarkMs() + 1))
              case None => state.remove()
            }
            out.result().iterator
          }
      }
  }

  case class RateAlert(user_id: Long, minute_ts: Long, n_events: Long)

  /** Per-user rate-limit detector on the Spark 4 `transformWithState`
    * API (the arbitrary-state successor to flatMapGroupsWithState):
    * one alert the moment a user's event count inside an event-time
    * minute first exceeds `limit`. State is a typed
    * `MapState[minute, count]` per user with a built-in TTL — the
    * state STORE evicts idle entries (RocksDB column-family TTL, no
    * timer bookkeeping in user code), which is the API's win over the
    * GroupState operators above: typed composite state + declarative
    * expiry instead of hand-rolled timeout plumbing. Requires the
    * RocksDB state store provider. Exactly one alert per (user,
    * minute) regardless of how far past the limit the burst runs, and
    * within a micro-batch events apply in (ts, event_id) order so
    * replays agree.
    */
  class RateLimitProcessor(limit: Long, ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, RateAlert] {
    @transient private var counts
      : org.apache.spark.sql.streaming.MapState[Long, Long] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getMapState[Long, Long]("minute_counts",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig(ttl))
    override def handleInputRows(uid: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[RateAlert] = {
      val out = Seq.newBuilder[RateAlert]
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val b = e.ts.getTime / 60000L
        val n = (if (counts.containsKey(b)) counts.getValue(b) else 0L) + 1L
        counts.updateValue(b, n)
        if (n == limit + 1) out += RateAlert(uid, b * 60L, n)
      }
      out.result().iterator
    }
  }

  def rateAlerts(events: Dataset[Event], limit: Long = 5,
                 ttl: java.time.Duration =
                   java.time.Duration.ofMinutes(30)): Dataset[RateAlert] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RateLimitProcessor(limit, ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
