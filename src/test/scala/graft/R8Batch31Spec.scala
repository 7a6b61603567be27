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

  test("mm_phash_top_pairs matches a local banded-candidate recompute") {
    val out = multimodal.BinaryColumns.phashTopPairs(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect()
      .filter(_.getAs[String]("text").nonEmpty)
      .map(r => (r.getAs[Long]("doc_id"),
        ahash48(r.getAs[String]("text"))))
    val cands = collection.mutable.Map.empty[(Long, Long), Long]
    for (band <- 0 until 4) {
      val byKey = docs.groupBy { case (_, h) => (h >> (band * 12)) & 4095L }
      for ((_, members) <- byKey if members.length >= 2) {
        val s = members.sortBy(_._1)
        for (i <- s.indices; j <- (i + 1) until s.length) {
          val d = java.lang.Long.bitCount(s(i)._2 ^ s(j)._2).toLong
          val key = (s(i)._1, s(j)._1)
          cands(key) = math.min(cands.getOrElse(key, Long.MaxValue), d)
        }
      }
    }
    val expected = cands.toSeq
      .sortBy { case ((a, b), h) => (h, a, b) }.take(20)
    assert(out.length == expected.length)
    for ((r, ((a, b), h)) <- out.zip(expected)) {
      assert(r.getAs[Long]("doc_a") == a)
      assert(r.getAs[Long]("doc_b") == b)
      assert(r.getAs[Long]("hamming") == h)
    }
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
