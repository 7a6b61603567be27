package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.{col, datediff, lit}

/** Round-8 batch 18: zone-map pruning simulation, order-velocity
  * forensics, Zipf head coverage, keyed-hash pseudonymization. Local
  * recompute pins at sf0.001.
  */
class R8Batch18Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniform(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) / math.pow(16, 8)

  private def dayCol(c: String) =
    datediff(col(c), lit("1992-01-01").cast("date")).cast("long").as("day")

  test("layout_pruning_sim matches a local zone recompute; sorted prunes") {
    val out = operators.Quality.layoutPruningSim(spark, sf).collect()
    assert(out.length == 10)
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), dayCol("l_shipdate"))
      .collect()
      .map(r => (r.getAs[Long]("l_orderkey"),
        r.getAs[Int]("l_linenumber"), r.getAs[Long]("day")))
    val d0 = rows.map(_._3).min
    val d1 = rows.map(_._3).max
    def zones(shardOf: ((Long, Int, Long)) => Long): Map[Long, (Long, Long)] =
      rows.groupBy(shardOf).view
        .mapValues(v => (v.map(_._3).min, v.map(_._3).max)).toMap
    val zh = zones { case (ok, ln, _) =>
      math.floor(uniform(s"$ok:$ln") * 32).toLong }
    val zs = zones { case (_, _, day) =>
      math.min(31L, 32L * (day - d0) / (d1 - d0 + 1)) }
    for (r <- out) {
      val qIdx = r.getAs[Long]("q_idx")
      val qDay = d0 + qIdx * (d1 - d0) / 10
      assert(r.getAs[Long]("q_day") == qDay)
      val fh = zh.values.count { case (mn, mx) => mn <= qDay && qDay <= mx }
      val fs = zs.values.count { case (mn, mx) => mn <= qDay && qDay <= mx }
      assert(r.getAs[Long]("files_hash") == fh.toLong, s"probe $qIdx hash")
      assert(r.getAs[Long]("files_sorted") == fs.toLong, s"probe $qIdx sorted")
      assert(r.getAs[Double]("prune_ratio_hash") == round6(1.0 - fh / 32.0))
      assert(r.getAs[Double]("prune_ratio_sorted") == round6(1.0 - fs / 32.0))
      // the measured claim: clustering never reads more files than hash
      assert(fs <= fh)
    }
    // hash layout must show (near-)zero pruning; clustered must prune
    assert(out.map(_.getAs[Long]("files_sorted")).max <=
      out.map(_.getAs[Long]("files_hash")).min)
  }

  test("customer_order_velocity matches a local sliding-window recompute") {
    val out = operators.Olap.customerOrderVelocity(spark, sf).collect()
    assert(out.length <= 20)
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), dayCol("o_orderdate")).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("day")))
    val byCust = orders.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val stats = byCust.map { case (ck, days) =>
      val burst = days.map(d => days.count(e => d - 6 <= e && e <= d)).max
      (ck, days.length.toLong, burst.toLong)
    }.toSeq
    val expected = stats.sortBy { case (ck, _, b) => (-b, ck) }.take(20)
    assert(out.length == expected.length)
    for ((r, (ck, n, b)) <- out.zip(expected)) {
      assert(r.getAs[Long]("o_custkey") == ck)
      assert(r.getAs[Long]("n_orders") == n)
      assert(r.getAs[Long]("max_burst_7d") == b)
      assert(r.getAs[Int]("flagged") == (if (b >= 3) 1 else 0))
    }
  }

  test("text_zipf_coverage matches a local frequency recompute") {
    val out = operators.TextAnalysis.textZipfCoverage(spark, sf).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(out.keySet == Set(10L, 100L, 1000L))
    val freq = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getAs[String]("text").split("\\s+"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTotal = freq.values.sum
    val nTypes = freq.size.toLong
    val ranked = freq.toSeq.sortBy { case (t, c) => (-c, t) }.take(1000)
    for (k <- Seq(10, 100, 1000)) {
      val head = ranked.take(k)
      val r = out(k.toLong)
      assert(r.getAs[Long]("n_in_head") == head.length.toLong)
      assert(r.getAs[Long]("covered_tokens") == head.map(_._2).sum)
      assert(r.getAs[Long]("n_total") == nTotal)
      assert(r.getAs[Long]("n_types") == nTypes)
      assert(r.getAs[Double]("coverage") ==
        round6(head.map(_._2).sum.toDouble / nTotal))
    }
    // cumulative mass is monotone in k
    assert(out(10L).getAs[Long]("covered_tokens") <=
      out(100L).getAs[Long]("covered_tokens"))
    assert(out(100L).getAs[Long]("covered_tokens") <=
      out(1000L).getAs[Long]("covered_tokens"))
  }

  test("privacy_pseudonymize: salted sha2 prefix, exact-cent spend top-20") {
    val out = operators.Governance.privacyPseudonymize(spark, sf).collect()
    assert(out.length == 20)
    val spend = Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getAs[Long]("o_custkey"),
        math.round(r.getAs[Double]("o_totalprice") * 100)))
      .groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val seg = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_mktsegment"))
      .toMap
    def pseudo(ck: Long): String = {
      val d = MessageDigest.getInstance("SHA-256")
        .digest(s"graft-pseudo:$ck".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.substring(0, 16)
    }
    val expected = spend.toSeq.map { case (ck, (n, cents)) =>
      (pseudo(ck), seg(ck), n, round6(cents / 100.0))
    }.sortBy { case (p, _, _, s) => (-s, p) }.take(20)
    for ((r, (p, sg, n, sp)) <- out.zip(expected)) {
      assert(r.getAs[String]("pseudonym") == p)
      assert(r.getAs[String]("c_mktsegment") == sg)
      assert(r.getAs[Long]("n_orders") == n)
      assert(r.getAs[Double]("total_spend") == sp)
      // no raw key survives into the extract
      assert(!r.schema.fieldNames.contains("c_custkey"))
    }
  }
}
