package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.{col, datediff, month, year}

/** Round-8 batch 19: Poisson-bootstrap CI, exact-bytes media dedup,
  * gap-island activity streaks, Wilson supplier on-time bounds.
  * Local recompute pins at sf0.001.
  */
class R8Batch19Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniform(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) / math.pow(16, 8)

  private val cdf = Array(0.36787944117144233, 0.7357588823428847,
    0.9196986029286058, 0.9810118431238463, 0.9963401531726563,
    0.9994058151824183, 0.999916758850712, 0.9999897508033253,
    0.999998874797402)

  private def poisson(u: Double): Long = {
    val i = cdf.indexWhere(u < _)
    if (i < 0) 9L else i.toLong
  }

  test("events_bootstrap_ci matches a local Poisson-bootstrap recompute") {
    val out = operators.Events.eventsBootstrapCi(spark, sf).collect()
      .map(r => r.getAs[String]("variant") -> r).toMap
    assert(out.keySet == Set("A", "B"))
    val pur = Tables.events(spark, sf)
      .filter("event_type = 'purchase'")
      .select("event_id", "user_id", "value").collect()
      .map(r => (r.getAs[Long]("event_id"),
        if (uniform(r.getAs[Long]("user_id").toString) < 0.5) "A" else "B",
        math.round(r.getAs[Double]("value") * 100)))
    for (v <- Seq("A", "B")) {
      val rows = pur.filter(_._2 == v)
      val r = out(v)
      assert(r.getAs[Long]("n_purchases") == rows.length.toLong)
      assert(r.getAs[Double]("point_mean") ==
        round6(rows.map(_._3.toDouble).sum / rows.length / 100.0))
      val means = (1 to 100).map { b =>
        var swv = 0L; var sw = 0L
        rows.foreach { case (id, _, vc) =>
          val w = poisson(uniform(s"$id#boot$b"))
          swv += w * vc; sw += w
        }
        (swv.toDouble / sw, b)
      }.sortBy(identity)
      assert(r.getAs[Double]("boot_lo") == round6(means(2)._1 / 100.0))
      assert(r.getAs[Double]("boot_hi") == round6(means(97)._1 / 100.0))
      // the interval brackets the point estimate
      assert(r.getAs[Double]("boot_lo") <= r.getAs[Double]("point_mean"))
      assert(r.getAs[Double]("point_mean") <= r.getAs[Double]("boot_hi"))
    }
  }

  test("mm_dedup_bytes matches a local digest-family recompute") {
    val out = multimodal.BinaryColumns.dedupBytes(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getAs[String]("text"))
    val fams = docs.groupBy(md5hex).map { case (_, v) =>
      (v.length.toLong, v.map(_.getBytes("UTF-8").length.toLong).sum,
        v.map(_.getBytes("UTF-8").length.toLong).min)
    }.toSeq
    val total = docs.map(_.getBytes("UTF-8").length.toLong).sum
    val byK = fams.groupBy(_._1)
    assert(out.length == byK.size)
    for (r <- out) {
      val k = r.getAs[Long]("family_size")
      val fs = byK(k)
      assert(r.getAs[Long]("n_families") == fs.length.toLong)
      assert(r.getAs[Long]("n_items") == k * fs.length)
      val reclaim = fs.map { case (_, tot, keep) => tot - keep }.sum
      assert(r.getAs[Long]("reclaim_bytes") == reclaim)
      assert(r.getAs[Double]("reclaim_share") ==
        round6(reclaim.toDouble / total))
      // identical payloads: reclaim is exactly (k-1)/k of family bytes
      if (k == 1L) assert(reclaim == 0L)
    }
  }

  test("customer_active_streaks matches a local gap-island recompute") {
    val out = operators.Olap.customerActiveStreaks(spark, sf).collect()
    val mo = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        ((year(col("o_orderdate")) - 1992) * 12
          + month(col("o_orderdate")) - 1).cast("long").as("m"))
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("m")))
      .distinct
    val longest = mo.groupBy(_._1).map { case (_, ms) =>
      val sorted = ms.map(_._2).sorted
      // island lengths from consecutive-month runs
      var best = 1L; var cur = 1L
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        if (w(1) == w(0) + 1) { cur += 1; best = math.max(best, cur) }
        else cur = 1L
      }
      best
    }.toSeq
    val byLen = longest.groupBy(identity).view.mapValues(_.size.toLong)
    assert(out.length == byLen.size)
    for (r <- out) {
      val len = r.getAs[Long]("streak_months")
      assert(r.getAs[Long]("n_customers") == byLen(len))
      assert(r.getAs[Double]("share") ==
        round6(byLen(len).toDouble / longest.length))
    }
    assert(out.map(_.getAs[Long]("n_customers")).sum == longest.length)
  }

  test("supplier_otif_wilson: Wilson bound is conservative and exact") {
    val out = operators.Olap.supplierOtifWilson(spark, sf).collect()
    val joined = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"),
        (datediff(col("l_shipdate"), col("o_orderdate")) <= 30)
          .cast("long").as("ontime"))
      .collect()
      .map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("ontime")))
    val bySupp = joined.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    assert(out.length == bySupp.size)
    val z = 1.959964
    for (r <- out) {
      val (n, x) = bySupp(r.getAs[Long]("l_suppkey"))
      assert(r.getAs[Long]("n_lines") == n)
      assert(r.getAs[Long]("n_ontime") == x)
      val p = x.toDouble / n
      val nd = n.toDouble
      val lb = ((p + z * z / (2 * nd))
        - z * math.sqrt(p * (1 - p) / nd + z * z / (4 * nd * nd))) /
        (1 + z * z / nd)
      assert(r.getAs[Double]("ontime_rate") == round6(p))
      assert(r.getAs[Double]("wilson_lb") == round6(lb))
      assert(r.getAs[Int]("flagged") == (if (lb < 0.5) 1 else 0))
      // Wilson lower bound never exceeds the raw rate
      assert(r.getAs[Double]("wilson_lb") <= r.getAs[Double]("ontime_rate"))
    }
  }
}
