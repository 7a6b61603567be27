package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, SessionUpdate}

class StreamingSpec extends SparkSpec {

  // hour-aligned 2024 base: epoch-0 event times sit exactly on the
  // initial watermark and get dropped as late
  private val base = 1704067200000L // 2024-01-01T00:00:00Z
  private def ts(min: Long): Timestamp = new Timestamp(base + min * 60000L)

  test("hourlyCounts: watermarked tumbling windows aggregate per type") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(61), 1, "view", 3.0),
        Event(4, ts(200), 2, "click", 4.0)) // advances watermark past hour 0-1
      q.processAllAvailable()
      val rows = spark.sql("select * from hourly").as[(Timestamp, String, Long, Double)].collect()
      val h0 = rows.filter(_._1 == ts(0))
      assert(h0.length == 1 && h0.head._2 == "click" && h0.head._3 == 2 && h0.head._4 == 3.0)
      val h1 = rows.filter(_._1 == ts(60))
      assert(h1.length == 1 && h1.head._2 == "view" && h1.head._3 == 1)
    } finally q.stop()
  }

  test("file source -> watermarked windows -> parquet sink, end to end") {
    import spark.implicits._
    // a real file-based stream (the ingestion shape for drop-folder
    // pipelines), not MemoryStream: rows land as json files, the
    // query discovers and processes them incrementally
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream-src")
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-stream-ck").toString
    def writeBatch(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.write(srcDir.resolve(name),
        rows.mkString("\n").getBytes("UTF-8"))
    def js(id: Long, min: Long, et: String, v: Double): String =
      s"""{"event_id":$id,"ts":"${new java.sql.Timestamp(base + min * 60000L)}","event_type":"$et","value":$v}"""
    writeBatch("b1.json", Seq(js(1, 5, "click", 1.0), js(2, 10, "click", 2.0)))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE")
    val stream = spark.readStream.schema(schema).json(srcDir.toString)
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // second file advances the watermark past hour 0 → window emits
      writeBatch("b2.json", Seq(js(3, 200, "view", 3.0)))
      q.processAllAvailable()
      val rows = spark.read.parquet(outDir)
        .as[(Timestamp, String, Long, Double)].collect()
      assert(rows.toSeq == Seq((ts(0), "click", 2L, 3.0)), rows.toSeq.toString)
    } finally q.stop()
  }

  test("streaming KMV sketch tracks distinct users with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.kmvDistinctUsers(input.toDS(), k = 32)
      .writeStream.format("memory").queryName("kmv")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "click", 1.0),
        Event(3, ts(2), 2, "click", 1.0)) // dup user
      q.processAllAvailable()
      input.addData(Event(4, ts(3), 3, "click", 1.0))
      q.processAllAvailable()
      // below k the estimate is exact; latest Update-mode row wins
      val rows = spark.sql("select * from kmv")
        .as[(String, Double)].collect()
      assert(rows.last == ("click", 3.0), rows.toSeq.toString)
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with prior-hour signups") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.purchaseSignupJoin(input.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(0), 7, "signup", 0.0),
        Event(2, ts(30), 7, "purchase", 5.0), // 30 min after signup → joins
        Event(3, ts(90), 7, "purchase", 6.0), // 90 min after signup → outside hour
        Event(4, ts(30), 8, "purchase", 7.0)) // no signup for user 8
      q.processAllAvailable()
      val rows = spark.sql("select p_event, user_id, s_event, gap_s from ssjoin")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(rows == Seq((2L, 7L, 1L, 1800L)), rows.toString)
    } finally q.stop()
  }

  test("sessionize: 30-min gap closes a session, state carries within") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // session A: minutes 0,10,20; then 70 (gap 50min) starts session B
      input.addData(
        Event(1, ts(0), 7, "click", 1.0),
        Event(2, ts(10), 7, "click", 2.0),
        Event(3, ts(20), 7, "click", 3.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(70), 7, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from sessions").as[SessionUpdate].collect()
      assert(rows.length == 1, s"expected exactly the closed session, got ${rows.toSeq}")
      val s = rows.head
      assert(s.user_id == 7 && s.session_start == base / 1000 && s.n_events == 3 && s.sum_value == 6.0)
    } finally q.stop()
  }

  test("sessionWindowAgg closes gap sessions declaratively, matching sessionize") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.sessionWindowAgg(input.toDF())
      .writeStream.format("memory").queryName("swagg")
      .outputMode(OutputMode.Append).start()
    try {
      // session A: minutes 0,10,20 for user 7; user 9 fires once at 15
      input.addData(
        Event(1, ts(0), 7, "click", 1.0),
        Event(2, ts(10), 7, "click", 2.0),
        Event(3, ts(20), 7, "click", 3.0),
        Event(4, ts(15), 9, "view", 5.0))
      q.processAllAvailable()
      // minute 300 pushes the watermark (1h) past both session ends
      input.addData(Event(5, ts(300), 7, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from swagg")
        .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
      assert(rows.length == 2, s"expected both closed sessions, got ${rows.toSeq}")
      val a = rows.find(_._1 == 7).get
      // start at minute 0, end = last event (min 20) + 30-min gap
      assert(a._2 == base / 1000 && a._3 == base / 1000 + 50 * 60)
      assert(a._4 == 3 && a._5 == 6.0)
      val b = rows.find(_._1 == 9).get
      assert(b._4 == 1 && b._5 == 5.0)
    } finally q.stop()
  }

  test("dedupStream drops in-watermark duplicate event ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(0), 1, "click", 1.0), // duplicate id
        Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      val n = spark.sql("select count(distinct event_id), count(*) from deduped").head
      assert(n.getLong(0) == 2 && n.getLong(1) == 2)
    } finally q.stop()
  }

  test("contaminationGate flags benchmark-overlapping docs once, passes clean docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // static benchmark side: the 5-gram hashes of one "eval" sentence
    // (10 words -> 6 grams); the gate needs >= 3 shared grams, i.e. a
    // verbatim run of >= 7 benchmark words — same bar as the batch op
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bench = Seq(benchText).toDF("text")
      .withColumn("t", split(col("text"), "\\s+"))
      .select(explode(expr(
        "transform(sequence(1, size(t)-4), i -> array_join(slice(t, i, 5), ' '))")).as("g5"))
      .select(md5(col("g5")).as("h"))
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.contaminationGate(docs, bench)
      .writeStream.format("memory").queryName("contam")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, ts(0), "alpha beta gamma delta epsilon zeta eta leaked run"), // 7-word run = 3 grams
        (2L, ts(1), "totally unrelated clean document text with words"),
        (1L, ts(2), "alpha beta gamma delta epsilon zeta eta again leak"), // same doc again
        (3L, ts(3), "beta gamma delta epsilon zeta short overlap only")) // 5-word run = 1 gram
      input.addData((9L, ts(300), "late watermark advancer document with words"))
      q.processAllAvailable()
      val flagged = spark.sql("select doc_id from contam").collect().map(_.getLong(0)).sorted
      assert(flagged.toSeq == Seq(1L), s"got ${flagged.toSeq}")
    } finally q.stop()
  }

  test("piiScrubStream redacts on ingest and agrees with the batch detectors") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.piiScrubStream(docs)
      .writeStream.format("memory").queryName("scrub")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, ts(0), "reach me at jo.doe+x@mail.example.org or 555-0199 today"),
        (2L, ts(1), "server at 192.168.0.12 and 10.0.3.77 responded"),
        (3L, ts(2), "a perfectly clean document with no identifiers"))
      q.processAllAvailable()
      val rows = spark.sql("select * from scrub order by doc_id").collect()
      assert(rows.length == 3)
      val byId = rows.map(r => r.getLong(0) ->
        (r.getString(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
      assert(byId(1L)._2 == 1 && byId(1L)._3 == 1 && byId(1L)._4 == 0)
      assert(byId(1L)._1.contains("<EMAIL>") && byId(1L)._1.contains("<PHONE>"))
      assert(byId(2L)._4 == 2 && byId(2L)._1.contains("<IP>"))
      assert(byId(3L) == (("a perfectly clean document with no identifiers", 0, 0, 0)))
      // no raw identifier survives the gate
      assert(rows.forall(r => !r.getString(2).contains("@mail") &&
        !r.getString(2).contains("192.168")))
    } finally q.stop()
  }

  test("streamHealth: a beyond-watermark late row is observed as dropped, state is bounded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("health_src")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past hour 0 (10-minute bound)
      input.addData(Event(2, ts(600), 1, "click", 1.0))
      q.processAllAvailable()
      // now a row 600 minutes late — the watermark must discard it
      input.addData(Event(3, ts(1), 1, "click", 99.0))
      q.processAllAvailable()
      val h = EventStreams.streamHealth(q)
      assert(h.batches >= 3 && h.inputRows == 3, h)
      assert(h.droppedByWatermark >= 1, s"late row must be counted as dropped: $h")
      assert(h.stateRows >= 1, s"open windows hold state: $h")
      assert(h.maxBatchDurationMs > 0)
    } finally q.stop()
  }

  test("curationStream: scrub -> quality gate -> content dedup, across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val longDoc = ("the quick brown fox jumps over lazy dogs near riverbank " * 3).trim
    val dupDoc = "some other sufficiently long document body " +
      "with many plain words inside it repeated across crawls " +
      "carrying enough distinct tokens that quality gates keep it end"
    val boiler = ("the a or and " * 8).trim // stop_ratio 1.0 -> dropped
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.curationStream(input.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, ts(0), longDoc + " contact jo@x.example.com"),
        (2L, ts(1), "too short to keep"),
        (3L, ts(2), dupDoc),
        (4L, ts(3), boiler))
      q.processAllAvailable()
      input.addData((5L, ts(4), dupDoc)) // exact re-crawl in a LATER batch
      q.processAllAvailable()
      val rows = spark.sql("select * from curated order by doc_id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L),
        s"got ${rows.map(_.getLong(0)).toSeq}")
      // PII never reaches the curated table
      assert(rows.forall(r => !r.getString(2).contains("jo@x")))
      assert(rows.find(_.getLong(0) == 1L).get.getString(2).contains("<EMAIL>"))
      // quality fields agree with the batch rules
      assert(rows.forall(r => r.getAs[Long]("n_tokens") >= 20
        && r.getAs[Double]("stop_ratio") <= 0.3))
    } finally q.stop()
  }

  test("cmsSketchStream bucket sums equal the batch sketch on the same tokens") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick red fox runs past the sleeping dog"),
      (3L, "a slow green turtle watches the quick fox"))
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = EventStreams.cmsSketchStream(docs)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(texts: _*)
      q.processAllAvailable()
      val streamed = spark.sql("select row, bucket, bsum from cms_stream")
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      // the same sketch computed in batch over the same rows
      val batch = texts.toDF("doc_id", "text")
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .withColumn("row", explode(expr("sequence(0, 3)")))
        .withColumn("bucket",
          substring(md5(concat(col("row"), lit("|"), col("token"))), 1, 2))
        .groupBy("row", "bucket").agg(count(lit(1)).as("bsum"))
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      // state is the sketch: never more than d*w keys
      assert(streamed.size <= 4 * 256)
    } finally q.stop()
  }

  test("contaminationGate fails fast when the benchmark set exceeds the inline cap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val bench = Seq("aaa", "bbb", "ccc").toDF("h")
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val e = intercept[IllegalArgumentException](
      EventStreams.contaminationGate(docs, bench, maxInlineGrams = 2))
    assert(e.getMessage.contains("contaminationGateBloom"))
  }

  test("contaminationGateBloom is a superset gate: flags every exact hit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bench = Seq(benchText).toDF("text")
      .withColumn("t", split(col("text"), "\\s+"))
      .select(explode(expr(
        "transform(sequence(1, size(t)-4), i -> array_join(slice(t, i, 5), ' '))")).as("g5"))
      .select(md5(col("g5")).as("h"))
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.contaminationGateBloom(docs, bench)
      .writeStream.format("memory").queryName("contam_bloom")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, ts(0), "alpha beta gamma delta epsilon zeta eta leaked run"), // 3 shared grams
        (2L, ts(1), "totally unrelated clean document text with words"),
        (1L, ts(2), "alpha beta gamma delta epsilon zeta eta again leak"),
        (3L, ts(3), "beta gamma delta epsilon zeta short overlap only")) // 1 shared gram
      input.addData((9L, ts(300), "late watermark advancer document with words"))
      q.processAllAvailable()
      val rows = spark.sql("select doc_id, n_maybe_shared from contam_bloom")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      // no false negatives: the exact-contaminated doc MUST be flagged,
      // with an estimate >= its exact shared count (Bloom FPs only add)
      val flagged = rows.map(_._1).toSet
      assert(flagged.contains(1L), s"got $rows")
      assert(rows.filter(_._1 == 1L).forall(_._2 >= 3), s"got $rows")
      // each doc emitted at most once (watermark dedup)
      assert(rows.map(_._1).length == flagged.size)
    } finally q.stop()
  }

  test("incrementalUpsert maintains latest-wins keyed table across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val input = MemoryStream[Event]
    val q = EventStreams.incrementalUpsert(input.toDS(), s"$dir/table", s"$dir/ckpt")
    try {
      input.addData(Event(1, ts(0), 7, "signup", 1.0), Event(2, ts(5), 8, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(10), 7, "purchase", 9.0)) // newer for user 7
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/table")
        .orderBy("user_id").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))).toSeq
      assert(rows == Seq((7L, "purchase"), (8L, "view")), rows.toString)
    } finally q.stop()
  }

  test("anomalyScoreStream: causal Welford z flags a planted outlier after burn-in") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.anomalyScoreStream(input.toDS())
      .writeStream.format("memory").queryName("anom")
      .outputMode(OutputMode.Append).start()
    try {
      val tame = (1 to 40).map(i => Event(i, ts(i), 1, "click", (i % 5).toDouble))
      input.addData(tame: _*)
      q.processAllAvailable()
      input.addData(Event(100, ts(100), 1, "click", 1000.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from anom")
        .as[EventStreams.AnomalyScore].collect()
      // burn-in: nothing among the first 30 may alarm; the state was
      // built from 40 tame events when the outlier arrives
      assert(rows.filter(_.event_id <= 30).forall(!_.is_anomaly))
      val outlier = rows.find(_.event_id == 100).get
      // exact parity with sample stats over the 40 tame values
      val vals = tame.map(_.value)
      val mean = vals.sum / vals.size
      val std = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (vals.size - 1))
      assert(outlier.is_anomaly)
      assert(math.abs(outlier.z - (1000.0 - mean) / std) < 1e-6, outlier.z.toString)
    } finally q.stop()
  }

  test("streaming sessionize agrees with the batch operator's totals") {
    import spark.implicits._
    // batch result on real data: every event in exactly one session
    val batch = operators.Events.eventsSessionize(spark, sf)
    val sums = batch.agg(org.apache.spark.sql.functions.sum("n_events")).head.getLong(0)
    assert(sums == Tables.events(spark, sf).count())
  }

  test("abMonitor: per-variant revenue moments reconcile with batch on replayed events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, round, sum, when}
    val real = Tables.events(spark, sf)
      .select(col("event_id"), col("ts_s"), col("user_id"),
        col("event_type"), col("value"))
      .collect().map(r => Event(r.getLong(0),
        new Timestamp(r.getLong(1) * 1000L), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val input = MemoryStream[Event]
    val q = EventStreams.abMonitor(input.toDS())
      .writeStream.format("memory").queryName("abmon")
      .outputMode(OutputMode.Complete).start()
    try {
      // replay in two batches — the monitor must accumulate across them
      val (b1, b2) = real.splitAt(real.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.sql("select * from abmon").collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      // batch truth: same event-level moments per variant
      val expect = Tables.events(spark, sf)
        .filter(col("event_type") === "purchase")
        .withColumn("variant", when(
          graft.functions.HexExprs.uniformHash(col("user_id").cast("string")) < 0.5,
          "A").otherwise("B"))
        .groupBy("variant")
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("s"),
          round(sum(col("value") * col("value")), 6).as("ss"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(got.keySet == expect.keySet && got.keySet.nonEmpty)
      got.keySet.foreach { v =>
        assert(got(v)._1 == expect(v)._1, s"$v count")
        assert(math.abs(got(v)._2 - expect(v)._2) < 1e-6, s"$v revenue")
        assert(math.abs(got(v)._3 - expect(v)._3) < 1e-6, s"$v revenue_sq")
      }
    } finally q.stop()
  }

  test("conversionDetect: purchase within window converts, stale view expires, one credit per view") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.conversionDetect(input.toDS(), windowS = 1800)
      .writeStream.format("memory").queryName("conversions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "view", 0.0),
        Event(2, ts(10), 1, "purchase", 5.0),   // converts: 600s after view 1
        Event(3, ts(15), 1, "purchase", 5.0),   // view consumed: NO second credit
        Event(4, ts(0), 2, "view", 0.0),
        Event(5, ts(60), 2, "purchase", 9.0),   // 3600s > window: stale, no credit
        Event(6, ts(0), 3, "click", 0.0),
        Event(7, ts(5), 3, "purchase", 1.0))    // no prior view at all
      q.processAllAvailable()
      // state carries ACROSS micro-batches: user 4 views now...
      input.addData(Event(8, ts(100), 4, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(9, ts(110), 4, "purchase", 2.0)) // ...buys next batch
      q.processAllAvailable()
      val rows = spark.sql("select * from conversions")
        .as[EventStreams.Conversion].collect().sortBy(_.user_id)
      assert(rows.length == 2, s"got ${rows.toSeq}")
      assert(rows(0) == EventStreams.Conversion(1, 1, 2, 600))
      assert(rows(1) == EventStreams.Conversion(4, 8, 9, 600))
    } finally q.stop()
  }

  test("heavyHittersStream: Misra-Gries guarantees hold against exact counts on replayed events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val m = 16
    val shards = 8
    val evs = Tables.events(spark, sf)
      .select("event_id", "ts_s", "user_id", "event_type", "value")
      .collect()
      .map(r => Event(r.getLong(0), new Timestamp(r.getLong(1) * 1000L),
        r.getLong(2), r.getString(3), r.getDouble(4)))
    val input = MemoryStream[Event]
    val q = EventStreams.heavyHittersStream(input.toDS(), m = m, shards = shards)
      .writeStream.format("memory").queryName("hitters")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(evs: _*) // one batch: output = final shard summaries
      q.processAllAvailable()
      val est = spark.sql("select * from hitters")
        .as[EventStreams.HitterEstimate].collect()
      assert(est.nonEmpty)
      // state bound: at most m entries per shard
      est.groupBy(_.shard).foreach { case (s, rows) =>
        assert(rows.length <= m, s"shard $s holds ${rows.length} > $m entries")
      }
      val exact = evs.groupBy(_.user_id).map { case (u, es) => u -> es.length.toLong }
      val perShardN = evs.groupBy(e => math.floorMod(e.user_id, shards.toLong).toInt)
        .map { case (s, es) => s -> es.length.toLong }
      val estMap = est.map(h => h.user_id -> h.est).toMap
      // frequent-items guarantee: every user above the shard threshold
      // n_shard/(m+1) is present, and no estimate overshoots the truth
      for ((u, c) <- exact) {
        val s = math.floorMod(u, shards.toLong).toInt
        if (c > perShardN(s).toDouble / (m + 1))
          assert(estMap.contains(u), s"hitter $u (count $c) missing from shard $s")
      }
      for ((u, e) <- estMap) assert(e <= exact(u), s"estimate for $u overshoots")
    } finally q.stop()
  }

  test("conversionDetect: pending view of an inactive user is evicted by event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.conversionDetect(input.toDS(), windowS = 1800, lateS = 1800)
      .writeStream.format("memory").queryName("evict")
      .outputMode(OutputMode.Append).start()
    try {
      // user 10 views and then goes silent forever; user 11 keeps the
      // stream (and the watermark) moving
      input.addData(Event(1, ts(0), 10, "view", 0.0),
                    Event(2, ts(0), 11, "view", 0.0))
      q.processAllAvailable()
      // watermark advances far past user 10's conversion deadline
      // (viewTs + windowS = base + 30min; watermark = 120min - 30min)
      input.addData(Event(3, ts(120), 11, "purchase", 1.0))
      q.processAllAvailable()
      // one more trigger so the timeout fires
      input.addData(Event(4, ts(121), 12, "view", 0.0))
      q.processAllAvailable()
      val conv = spark.sql("select * from evict").as[EventStreams.Conversion].collect()
      assert(conv.isEmpty, s"nothing converts here: ${conv.toSeq}")
      val stateRows = q.recentProgress.filter(_.stateOperators.nonEmpty)
        .last.stateOperators(0).numRowsTotal
      // user 10 evicted by timeout, user 11 cleared by the stale
      // purchase — only user 12's fresh view remains
      assert(stateRows == 1,
        s"state must be O(active users), got $stateRows rows")
    } finally q.stop()
  }

  test("conversionDetect: out-of-order purchase that predates the view cannot cancel it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.conversionDetect(input.toDS(), windowS = 1800, lateS = 1800)
      .writeStream.format("memory").queryName("late_purchase")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(1, ts(100), 20, "view", 0.0))
      q.processAllAvailable()
      // a late purchase from BEFORE the view arrives in the next
      // micro-batch (within the watermark delay, so it is processed);
      // it must not consume the still-valid pending view
      input.addData(Event(2, ts(90), 20, "purchase", 1.0),
                    Event(3, ts(101), 20, "purchase", 2.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from late_purchase")
        .as[EventStreams.Conversion].collect()
      assert(rows.toSeq == Seq(EventStreams.Conversion(20, 1, 3, 60)),
        s"the in-window purchase keeps its credit: ${rows.toSeq}")
    } finally q.stop()
  }

  test("conversionDetect replay matches a plain-Scala fold of the same machine on real events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val windowS = 1800L
    val evs = Tables.events(spark, sf)
      .select("event_id", "ts_s", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    // reference: per-user fold of the documented semantics
    val expected = evs.groupBy(_._3).toSeq.flatMap { case (uid, rows) =>
      var pending: Option[(Long, Long)] = None // (viewTs, viewId)
      rows.toSeq.sortBy(e => (e._2, e._1)).flatMap { e =>
        e._4 match {
          case "view" => pending = Some((e._2, e._1)); None
          case "purchase" => pending match {
            case Some((vt, vid)) if e._2 >= vt && e._2 - vt <= windowS =>
              pending = None
              Some(EventStreams.Conversion(uid, vid, e._1, e._2 - vt))
            case Some((vt, _)) if e._2 - vt > windowS =>
              pending = None; None
            case _ => None
          }
          case _ => None
        }
      }
    }.toSet
    val input = MemoryStream[Event]
    val q = EventStreams.conversionDetect(input.toDS(), windowS = windowS)
      .writeStream.format("memory").queryName("replay_parity")
      .outputMode(OutputMode.Append).start()
    try {
      // one batch: the initial watermark is 0, so nothing is late and
      // the full history replays through the state machine
      input.addData(evs.map(e =>
        Event(e._1, new Timestamp(e._2 * 1000L), e._3, e._4, e._5)): _*)
      q.processAllAvailable()
      val got = spark.sql("select * from replay_parity")
        .as[EventStreams.Conversion].collect().toSet
      assert(got == expected,
        s"streaming/batch parity: ${got.size} streamed vs ${expected.size} folded; " +
          s"diff=${(got diff expected).take(3)} / ${(expected diff got).take(3)}")
    } finally q.stop()
    // three-way pin: the declarative batch twin (two IGNORE-NULLS
    // running-last windows, no state machine) agrees with the same
    // fold — so streaming CEP == batch operator on identical data
    val batch = operators.Events.eventsConversions(spark, sf)
      .as[EventStreams.Conversion].collect().toSet
    assert(batch == expected,
      s"batch operator parity: ${batch.size} vs ${expected.size}; " +
        s"diff=${(batch diff expected).take(3)} / ${(expected diff batch).take(3)}")
  }

  test("rateAlerts (transformWithState): one alert per user-minute crossing the limit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    // transformWithState requires the RocksDB state store. Keep the
    // test query to TWO state-store instances and changelog (delta)
    // checkpointing: each RocksDB instance checkpoints through
    // Hadoop's RawLocalFileSystem, which shells out a subprocess per
    // file stat — at 32 partitions × full snapshots that is minutes
    // of fork() for a 12-row stream.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    // ProcessingTime TimeMode (the only mode that allows state TTL)
    // makes shouldRunAnotherBatch always-true so processing-time
    // timers can fire; with no-data micro-batches enabled the query
    // busy-loops empty batches and processAllAvailable never sees
    // noNewData. Timers aren't used here — only TTL — so data-driven
    // batches are sufficient.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val input = MemoryStream[Event]
    val q = EventStreams.rateAlerts(input.toDS(), limit = 3)
      .writeStream.format("memory").queryName("rate_alerts")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: 4 events inside minute 0 → one alert; user 2: 3 events → none
      input.addData(
        Event(1, ts(0), 1, "click", 0.0), Event(2, ts(0), 1, "click", 0.0),
        Event(3, ts(0), 1, "click", 0.0), Event(4, ts(0), 1, "click", 0.0),
        Event(5, ts(0), 2, "click", 0.0), Event(6, ts(0), 2, "click", 0.0),
        Event(7, ts(0), 2, "click", 0.0))
      q.processAllAvailable()
      // user 1 keeps bursting in the SAME minute across a later
      // micro-batch: the MapState count carries over, but the alert
      // already fired — no duplicate. A burst in a NEW minute alerts
      // again.
      input.addData(
        Event(8, ts(0), 1, "click", 0.0),
        Event(9, ts(1), 1, "click", 0.0), Event(10, ts(1), 1, "click", 0.0),
        Event(11, ts(1), 1, "click", 0.0), Event(12, ts(1), 1, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from rate_alerts")
        .as[EventStreams.RateAlert].collect().toSet
      val m0 = base / 1000L
      assert(rows == Set(
        EventStreams.RateAlert(1, m0, 4),
        EventStreams.RateAlert(1, m0 + 60, 4)),
        s"got $rows")
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
