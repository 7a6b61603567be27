package graft

import org.apache.spark.sql.functions._

/** Invariants for the quantization / tokenizer-training / attribution
  * batch. Value parity vs DuckDB is covered by Verify + check_oracle;
  * these pin semantics and plan shape.
  */
class Batch9OpsSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("embed_quantize_int8: codes bounded, error bounded by half a quantization step") {
    val out = operators.Similarity.embedQuantizeInt8(spark, sf).cache()
    assert(out.count() == 64) // one row per embedding dimension
    assert(out.filter(col("max_code") > 127).count() == 0)
    assert(out.filter(col("scale") <= 0).count() == 0)
    // |x - dequant(x)| <= scale/127/2 pointwise, so the mean obeys it too
    assert(out.filter(
      col("avg_abs_err") > col("scale") / lit(254.0) + lit(1e-9)).count() == 0)
    out.unpersist()
  }

  test("bpe_pair_merge: pairs are 2 chars and the top count matches a direct recount") {
    val out = operators.TextAnalysis.bpePairMerge(spark, sf).cache()
    assert(out.filter(length(col("pair")) =!= 2).count() == 0)
    val rows = out.orderBy("rank").collect()
    assert(rows.map(_.getAs[Long]("cnt")).sliding(2).forall(w => w(0) >= w(1)))
    // independent recount of the #1 pair straight off the corpus
    val top = rows.head.getAs[String]("pair")
    val direct = Tables.documents(spark, sf)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("p"))
      .filter(col("p") === top).count()
    assert(rows.head.getAs[Long]("cnt") == direct)
    out.unpersist()
  }

  test("events_attribution: plans through AsofJoinExec; shares sum to 1; purchases conserved") {
    val df = operators.Events.eventsAttribution(spark, sf)
    assert(plan(df).contains("AsofJoin"), "latest-prior lookup must be the custom exec")
    val rows = df.collect()
    val channels = rows.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("view", "click", "unattributed")))
    val nPurch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == nPurch)
    val shareSum = rows.map(_.getAs[Double]("rev_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
  }

  test("events_session_stats: session counts conserve the sessionize output") {
    val out = operators.Events.eventsSessionStats(spark, sf).collect()
    val nSessions = operators.Events.eventsSessionize(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_sessions")).sum == nSessions)
    // avg duration of a 1-event session is 0 by construction
    out.find(_.getAs[String]("bucket") == "1")
      .foreach(r => assert(r.getAs[Double]("avg_duration_s") == 0.0))
  }

  test("orders_ntile: quartiles within a nation are balanced (sizes differ by <= 1)") {
    val out = operators.Olap.ordersNtile(spark, sf).cache()
    val skew = out.groupBy("nationkey")
      .agg((max("n_cust") - min("n_cust")).as("spread"))
      .filter(col("spread") > 1).count()
    assert(skew == 0)
    // every ordering customer lands in exactly one quartile
    val total = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(out.agg(sum("n_cust")).head.getLong(0) == total)
    out.unpersist()
  }

  test("knn_recall_eval: hits bounded by k and by the candidate count") {
    val r = operators.Similarity.knnRecallEval(spark, sf).head()
    val (k, nc, nh, recall) = (r.getAs[Int]("k"), r.getAs[Long]("n_candidates"),
      r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))
    assert(nh <= k && nh <= nc)
    assert(recall == nh.toDouble / k)
  }

  test("events_heatmap: cells bounded by 168 and counts conserve the stream") {
    val out = operators.Events.eventsHeatmap(spark, sf).cache()
    assert(out.count() <= 168)
    assert(out.filter(col("dow") < 0 || col("dow") > 6
      || col("hour") < 0 || col("hour") > 23).count() == 0)
    assert(out.agg(sum("n_events")).head.getLong(0)
      == Tables.events(spark, sf).count())
    out.unpersist()
  }

  test("readMediaFiles: binaryFile ingestion lands in the asMedia schema, hashes intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toFile
    try {
      val payloads = Map("a.png" -> "fake-png-bytes", "b.wav" -> "RIFFdata",
        "c.bin" -> "opaque")
      payloads.foreach { case (name, content) =>
        java.nio.file.Files.write(new java.io.File(dir, name).toPath,
          content.getBytes("UTF-8"))
      }
      val got = multimodal.BinaryColumns
        .readMediaFiles(spark, dir.getAbsolutePath).collect()
      assert(got.length == 3)
      assert(got.map(_.media_id).distinct.length == 3)
      val byHash = got.map(r => new String(r.payload, "UTF-8")).toSet
      assert(byHash == payloads.values.toSet)
      got.foreach { r =>
        assert(r.n_bytes == r.payload.length.toLong)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(r.payload).map("%02x".format(_)).mkString
        assert(r.content_hash == md)
      }
      // mime inferred from extension
      val mimes = got.map(_.mime).sorted.toSeq
      assert(mimes == Seq("application/octet-stream", "audio/wav", "image/png"))
      // same downstream decode as the column-sourced path
      import spark.implicits._
      val feats = multimodal.BinaryColumns.readMediaFiles(spark, dir.getAbsolutePath)
        .mapPartitions { rows =>
          rows.map { r =>
            val (s, h, t) = multimodal.BinaryColumns.FakeDecoder.decode(r.payload)
            (r.media_id, s, h, t)
          }
        }.collect()
      assert(feats.length == 3 && feats.forall(_._2 > 0))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("decodeImageReal: a real PNG round-trips through the partition-parallel decode") {
    import spark.implicits._
    // generate genuine PNGs in-memory: solid red 32x16 and solid
    // green-ish 8x8, encoded by the same JDK codec that decodes them
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      multimodal.BinaryColumns.MediaRow(1L, png(32, 16, 0xff0000), "image/png",
        0L, ""),
      multimodal.BinaryColumns.MediaRow(2L, png(8, 8, 0x00c800), "image/png",
        0L, ""))
    val ds = spark.createDataset(rows)
    val feats = multimodal.BinaryColumns.realDecodeImageFeatures(ds)
      .collect().sortBy(_.media_id)
    assert(feats.map(f => (f.media_id, f.width, f.height)).toSeq ==
      Seq((1L, 32, 16), (2L, 8, 8)))
    val red = feats(0)
    assert(math.abs(red.mean_r - 1.0f) < 1e-3 && red.mean_g < 1e-3 &&
      red.mean_b < 1e-3, s"solid red must decode to (1,0,0): $red")
    val green = feats(1)
    assert(math.abs(green.mean_g - 200f / 255f) < 1e-3 && green.mean_r < 1e-3,
      s"green channel must survive the codec round-trip: $green")
    // zero ??? remain in the tree: the stub contract is now real code
  }
}
