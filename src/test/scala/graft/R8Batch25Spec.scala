package graft

import org.apache.spark.sql.functions.{col, datediff, expr, quarter, year}

/** Round-8 batch 25: Heaps'-law vocabulary growth, fulfillment
  * latency trend, dedup survival by source, discount lift. Local
  * recompute pins at sf0.001.
  */
class R8Batch25Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("text_heaps_law: checkpoints equal brute-force prefix distincts") {
    val out = operators.TextAnalysis.textHeapsLaw(spark, sf).collect()
    assert(out.length == 10)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").split("\\s+").toSeq))
    val maxDoc = docs.map(_._1).max
    for (r <- out) {
      val ck = r.getAs[Long]("ck")
      val lim = ck * (maxDoc + 1) / 10
      val prefix = docs.filter(_._1 < lim)
      // brute force: actual distinct types and token mass of the prefix
      assert(r.getAs[Long]("v_types") ==
        prefix.flatMap(_._2).distinct.length.toLong, s"ck $ck types")
      assert(r.getAs[Long]("n_tokens") ==
        prefix.map(_._2.length.toLong).sum, s"ck $ck tokens")
    }
    // OLS fit recompute on the checkpoint points
    val pts = out.map(r => (math.log(r.getAs[Long]("n_tokens").toDouble),
      math.log(r.getAs[Long]("v_types").toDouble)))
    val n = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(out.head.getAs[Double]("beta") - beta) < 1e-5)
    assert(math.abs(out.head.getAs[Double]("k") -
      math.exp((sy - beta * sx) / n)) < 1e-4)
    // vocabulary growth is sublinear (β<1); the synthetic corpus's
    // closed vocabulary legitimately saturates to β=0 at tiny SF
    assert(out.head.getAs[Double]("beta") >= 0.0)
    assert(out.head.getAs[Double]("beta") < 1.0)
    // and the checkpoint curve itself must be non-decreasing
    val vs = out.sortBy(_.getAs[Long]("ck")).map(_.getAs[Long]("v_types"))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
  }

  test("lineitem_latency_trend: exact quantiles per quarter") {
    val out = operators.Olap.lineitemLatencyTrend(spark, sf).collect()
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(((year(col("o_orderdate")) - 1992) * 4
        + quarter(col("o_orderdate")) - 1).cast("long").as("q"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
          .as("days"))
      .collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("days")))
    val byQ = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(out.length == byQ.size)
    for (r <- out) {
      val q = r.getAs[Long]("quarter")
      val ds = byQ(q)
      assert(r.getAs[Long]("n_lines") == ds.length.toLong)
      assert(r.getAs[Double]("mean_days") ==
        round6(ds.sum.toDouble / ds.length))
      // min day whose inclusive cumulative count reaches the quantile
      def qtile(p: Int, of: Int): Long =
        ds(math.max(0, math.ceil(ds.length.toDouble * p / of).toInt - 1))
      assert(r.getAs[Long]("p50_days") == qtile(1, 2), s"q $q p50")
      assert(r.getAs[Long]("p90_days") == qtile(9, 10), s"q $q p90")
      assert(r.getAs[Long]("p50_days") <= r.getAs[Long]("p90_days"))
    }
  }

  test("dedup_source_survival: kept + removed partition each source") {
    val out = operators.Dedup.dedupSourceSurvival(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text")))
    val keeper = docs.groupBy(_._3).view
      .mapValues(_.map(_._1).min).toMap
    val bySrc = docs.groupBy(_._2)
    assert(out.length == bySrc.size)
    for (r <- out) {
      val src = r.getAs[String]("source")
      val rows = bySrc(src)
      val removed = rows.count { case (id, _, t) => keeper(t) != id }
      assert(r.getAs[Long]("n_docs") == rows.length.toLong)
      assert(r.getAs[Long]("n_removed") == removed.toLong)
      assert(r.getAs[Long]("n_kept") == (rows.length - removed).toLong)
      assert(r.getAs[Double]("removed_share") ==
        round6(removed.toDouble / rows.length))
    }
    // global: total kept = number of distinct texts
    assert(out.map(_.getAs[Long]("n_kept")).sum ==
      docs.map(_._3).distinct.length.toLong)
  }

  test("lineitem_discount_lift matches a local exact recompute") {
    val out = operators.Olap.lineitemDiscountLift(spark, sf).collect()
    val rows = Tables.lineitem(spark, sf)
      .select("l_discount", "l_quantity", "l_extendedprice").collect()
      .map { r =>
        val d = r.getAs[Double]("l_discount")
        (math.round(d * 100),
          r.getAs[Double]("l_quantity").toLong,
          math.round(r.getAs[Double]("l_extendedprice") * (1.0 - d) * 100))
      }
    val byD = rows.groupBy(_._1)
    val total = rows.map(_._3).sum
    assert(out.length == byD.size)
    for (r <- out) {
      val d = r.getAs[Long]("disc_pct")
      val rs = byD(d)
      assert(r.getAs[Long]("n_lines") == rs.length.toLong)
      assert(r.getAs[Double]("avg_qty") ==
        round6(rs.map(_._2).sum.toDouble / rs.length))
      assert(r.getAs[Double]("revenue_share") ==
        round6(rs.map(_._3).sum.toDouble / total))
    }
    assert(out.map(_.getAs[Long]("n_lines")).sum == rows.length.toLong)
  }
}
