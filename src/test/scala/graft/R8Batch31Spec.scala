package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.{col, month}

/** Round-8 batch 31: seasonality index, pHash review queue, degree
  * Gini, Levene variance test. Local recompute pins at sf0.001.
  */
class R8Batch31Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniform(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) / math.pow(16, 8)

  test("orders_seasonality_index: indexes average to 1 when complete") {
    val out = operators.Olap.ordersSeasonalityIndex(spark, sf).collect()
    val rows = Tables.orders(spark, sf)
      .select(month(col("o_orderdate")).cast("long").as("m"),
        col("o_totalprice")).collect()
      .map(r => (r.getAs[Long]("m"),
        math.round(r.getAs[Double]("o_totalprice") * 100)))
    val byM = rows.groupBy(_._1)
    val nt = rows.length
    assert(out.length == byM.size)
    for (r <- out) {
      val m = r.getAs[Long]("month")
      val ms = byM(m)
      assert(r.getAs[Long]("n_orders") == ms.length.toLong)
      assert(r.getAs[Double]("volume_index") ==
        round6(ms.length.toDouble * 12 / nt))
      assert(r.getAs[Double]("value_index") ==
        round6(ms.map(_._2).sum.toDouble * 12 /
          rows.map(_._2).sum))
    }
    // shares sum to 12 when all months present
    if (out.length == 12)
      assert(math.abs(out.map(_.getAs[Double]("volume_index")).sum
        - 12.0) < 1e-3)
  }

  /** Arithmetic twin of the real PNG→decode→averageHash64 chain (see
    * R8Batch17Spec.ahash48 and BinaryColumns.docPng for the exactness
    * argument).
    */
  private def ahash48(text: String): Long = {
    val len = text.length
    val v = Array.tabulate(64)(i =>
      math.min(text.charAt(((i.toLong * len) / 64).toInt).toInt, 255))
    val s = v.map(_.toLong).sum
    var bits = 0L
    for (i <- 0 until 48) if (64L * v(i) > s) bits |= 1L << i
    bits
  }

  /** Local recompute of [[multimodal.BinaryColumns.phashTopPairs]]'
    * capped semantics over an arbitrary (doc_id, h48) set: hot-bucket
    * summaries (k > cap, top-20 by size) + warm-bucket top-20 pairs.
    */
  private def expectedTopPairs(docs: Seq[(Long, Long)])
      : (Seq[(Long, Long, Long, Long, Double)], Seq[(Long, Long, Long)]) = {
    val cap = multimodal.BinaryColumns.PhashHotBucketCap
    val hotRows = collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Double)]
    val cands = collection.mutable.Map.empty[(Long, Long), Long]
    for (band <- 0 until 4) {
      val byKey = docs.groupBy { case (_, h) => (h >> (band * 12)) & 4095L }
      for ((bkey, members) <- byKey if members.length >= 2) {
        val s = members.sortBy(_._1)
        if (members.length > cap) {
          var sumHam = 0L
          for (i <- s.indices; j <- (i + 1) until s.length)
            sumHam += java.lang.Long.bitCount(s(i)._2 ^ s(j)._2).toLong
          val nPairs = s.length.toLong * (s.length - 1) / 2
          hotRows += ((band + 1L, bkey, s.length.toLong, nPairs,
            round6(sumHam.toDouble / nPairs)))
        } else {
          for (i <- s.indices; j <- (i + 1) until s.length) {
            val d = java.lang.Long.bitCount(s(i)._2 ^ s(j)._2).toLong
            val key = (s(i)._1, s(j)._1)
            cands(key) = math.min(cands.getOrElse(key, Long.MaxValue), d)
          }
        }
      }
    }
    val hot = hotRows.toSeq
      .sortBy { case (band, bkey, k, _, _) => (-k, band, bkey) }.take(20)
    val pairs = cands.toSeq
      .sortBy { case ((a, b), h) => (h, a, b) }.take(20)
      .map { case ((a, b), h) => (a, b, h) }
    (hot, pairs)
  }

  private def checkTopPairs(out: Array[org.apache.spark.sql.Row],
      docs: Seq[(Long, Long)]): Unit = {
    val (hot, pairs) = expectedTopPairs(docs)
    val outHot = out.filter(_.getAs[String]("kind") == "hot_bucket")
    val outPairs = out.filter(_.getAs[String]("kind") == "pair")
    assert(out.length == hot.length + pairs.length)
    assert(outHot.length == hot.length)
    for ((r, (band, bkey, k, nPairs, avg)) <- outHot.zip(hot)) {
      assert(r.getAs[Long]("band") == band)
      assert(r.getAs[Long]("bkey") == bkey)
      assert(r.getAs[Long]("bucket_k") == k)
      assert(r.getAs[Long]("n_pairs") == nPairs)
      assert(r.getAs[Double]("avg_hamming") == avg)
      assert(r.isNullAt(r.fieldIndex("doc_a")))
      assert(r.isNullAt(r.fieldIndex("hamming")))
    }
    for ((r, (a, b, h)) <- outPairs.zip(pairs)) {
      assert(r.getAs[Long]("doc_a") == a)
      assert(r.getAs[Long]("doc_b") == b)
      assert(r.getAs[Long]("hamming") == h)
      assert(r.isNullAt(r.fieldIndex("band")))
      assert(r.isNullAt(r.fieldIndex("bucket_k")))
    }
  }

  test("mm_phash_top_pairs matches a local banded-candidate recompute") {
    val out = multimodal.BinaryColumns.phashTopPairs(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect()
      .filter(_.getAs[String]("text").nonEmpty)
      .map(r => (r.getAs[Long]("doc_id"),
        ahash48(r.getAs[String]("text"))))
    checkTopPairs(out, docs.toSeq)
  }

  test("mm_phash_top_pairs: a planted hot family is ONE summary row, " +
      "never a pair emission; warm near-dups still surface as pairs") {
    val cap = multimodal.BinaryColumns.PhashHotBucketCap
    val dir = java.nio.file.Files
      .createTempDirectory("phash_capped").toString
    // one duplicate family of cap+8 identical texts (all 4 band keys
    // collide, Hamming 0 — the hot regime), plus 6 distinct warm
    // texts sharing a near-identical template (warm-bucket pairs)
    val hotN = cap + 8
    val texts =
      (0 until hotN).map(i => (i.toLong, "alpha beta gamma delta " * 8)) ++
      (0 until 6).map(i => (100L + i,
        s"omega psi chi phi tau ${('a' + i).toChar} " * 6))
    import spark.implicits._
    texts.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    PlanCache.invalidate(dir)
    val out = multimodal.BinaryColumns.phashTopPairs(spark, dir).collect()
    val docs = texts.map { case (id, t) => (id, ahash48(t)) }
    checkTopPairs(out, docs)
    val outHot = out.filter(_.getAs[String]("kind") == "hot_bucket")
    // the planted family: 4 hot buckets (one per band), k = cap+8,
    // Hamming 0 — and NO pair row touches the hot family's members
    assert(outHot.length == 4)
    assert(outHot.forall(_.getAs[Long]("bucket_k") == hotN.toLong))
    assert(outHot.forall(_.getAs[Double]("avg_hamming") == 0.0))
    val hotIds = (0 until hotN).map(_.toLong).toSet
    val outPairs = out.filter(_.getAs[String]("kind") == "pair")
    assert(outPairs.nonEmpty)
    assert(outPairs.forall(r => !hotIds(r.getAs[Long]("doc_a")) &&
      !hotIds(r.getAs[Long]("doc_b"))))
    PlanCache.invalidate(dir)
  }

  test("grayLevels samples by CODE POINT (oracle substr/ascii " +
      "semantics), not UTF-16 index") {
    // a supplementary-plane char (surrogate PAIR in UTF-16) followed
    // by ASCII: charAt-based sampling would shift every later index
    val text = "😀" + ('a' to 'z').mkString // 😀 + 26 ASCII
    val v = multimodal.BinaryColumns.grayLevels(text)
    val cps = text.codePoints().toArray
    val len = cps.length
    for (i <- 0 until 64)
      assert(v(i) == math.min(cps(((i.toLong * len) / 64).toInt), 255),
        s"sample $i")
  }

  test("graph_degree_gini matches a local sorted-rank recompute") {
    val out = operators.Graph.graphDegreeGini(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect()
      .map(x => (x.getAs[Long]("o"), x.getAs[Long]("p")))
    val edges = op.groupBy(_._1).values.flatMap { ps =>
      val s = ps.map(_._2).distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.toSet
    val deg = edges.toSeq.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).view.mapValues(_.size.toLong).values.toSeq.sorted
    val n = deg.length
    assert(r.getAs[Long]("n_nodes") == n.toLong)
    assert(r.getAs[Double]("mean_degree") ==
      round6(deg.sum.toDouble / n))
    val srx = deg.zipWithIndex.map { case (d, i) => d * (i + 1L) }.sum
    val gini = (2.0 * srx - (n + 1.0) * deg.sum) / (n.toDouble * deg.sum)
    assert(r.getAs[Double]("degree_gini") == round6(gini))
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("events_levene_variance matches a local Brown-Forsythe recompute") {
    val out = operators.Events.eventsLeveneVariance(spark, sf).collect()
      .map(r => r.getAs[String]("variant") -> r).toMap
    assert(out.keySet == Set("A", "B"))
    val pur = Tables.events(spark, sf).filter("event_type = 'purchase'")
      .select("user_id", "value").collect()
      .map(r => (if (uniform(r.getAs[Long]("user_id").toString) < 0.5)
        "A" else "B", math.round(r.getAs[Double]("value") * 100)))
    val byV = pur.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val zs = byV.map { case (v, vs) =>
      val mean = vs.sum.toDouble / vs.length
      v -> vs.map(x => math.round(math.abs(x - mean)))
    }
    val g = zs.size.toLong
    val n = pur.length.toLong
    val s = zs.values.flatten.sum
    val sq = zs.values.flatten.map(z => z * z).sum
    val bt = zs.values.map { z =>
      math.round(z.sum.toDouble * z.sum / z.length * 1e-2)
    }.sum
    val ssb = bt.toDouble * 1e2 - s.toDouble * s / n
    val ssw = sq.toDouble - bt.toDouble * 1e2
    val f = (ssb / (g - 1)) / (ssw / (n - g))
    for (v <- Seq("A", "B")) {
      val r = out(v)
      assert(r.getAs[Long]("n") == zs(v).length.toLong)
      assert(r.getAs[Double]("mean_abs_dev") ==
        round6(zs(v).sum.toDouble / zs(v).length / 100.0))
      assert(r.getAs[Double]("levene_f") == round6(f))
      assert(r.getAs[Long]("dof_between") == g - 1)
      assert(r.getAs[Long]("dof_within") == n - g)
      // mean absolute deviation is non-negative by construction
      assert(r.getAs[Double]("mean_abs_dev") >= 0.0)
    }
  }
}
