package graft

import org.apache.spark.sql.functions.{col, expr, year}

/** Round-8 batch 27: revenue growth-accounting bridge, Brown's DES
  * forecast, pipeline freshness monitor, ICC variance decomposition.
  * Local recompute pins at sf0.001.
  */
class R8Batch27Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def round2(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("orders_revenue_bridge: yearly flows reconcile exactly") {
    val out = operators.Olap.ordersRevenueBridge(spark, sf).collect()
      .map(r => r.getAs[Long]("yr") -> r).toMap
    val cy = Tables.orders(spark, sf)
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long")
        .as("yr"), col("o_totalprice")).collect()
      .map(r => ((r.getAs[Long]("o_custkey"), r.getAs[Long]("yr")),
        math.round(r.getAs[Double]("o_totalprice") * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byCust = cy.keys.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    val years = cy.keys.map(_._2).toSeq.distinct.sorted
    assert(out.keySet == years.toSet)
    for (yr <- years) {
      val r = out(yr)
      var nNew, nRet, nRes = 0L
      var revNew, revRet, revRes, revTot = 0L
      for ((ck, ys) <- byCust if ys.contains(yr)) {
        val rev = cy((ck, yr))
        revTot += rev
        val i = ys.indexOf(yr)
        if (i == 0) { nNew += 1; revNew += rev }
        else if (ys(i - 1) == yr - 1) { nRet += 1; revRet += rev }
        else { nRes += 1; revRes += rev }
      }
      assert(r.getAs[Long]("n_customers") == nNew + nRet + nRes)
      assert(r.getAs[Double]("revenue") == round2(revTot / 100.0))
      assert(r.getAs[Double]("rev_new") == round2(revNew / 100.0))
      assert(r.getAs[Double]("rev_retained") == round2(revRet / 100.0))
      assert(r.getAs[Double]("rev_resurrected") == round2(revRes / 100.0))
      // churned-out = prev-year spend of prev-year buyers who skipped yr
      val churn = byCust.collect {
        case (ck, ys) if ys.contains(yr - 1) && !ys.contains(yr) =>
          cy((ck, yr - 1))
      }.sum
      assert(r.getAs[Double]("rev_churned_out") == round2(churn / 100.0),
        s"yr $yr churn")
    }
  }

  test("events_forecast_des matches the sequential DES recurrence") {
    val out = operators.Events.eventsForecastDes(spark, sf).collect()
      .sortBy(_.getAs[Long]("day_idx"))
    val daily = Tables.events(spark, sf)
      .groupBy(expr("ts_s div 86400").as("day"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("y"))
      .collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("y")))
      .sortBy(_._1)
    val d0 = daily.map(_._1).min
    val a = 0.3
    // the closed-form weighted sums the op computes, with the same
    // per-term nano-rounding
    val ts = daily.map(_._1 - d0)
    def ewma(vs: Seq[Double]): Seq[Double] =
      ts.map { t =>
        val terms = ts.zip(vs).collect { case (k, v) if k <= t =>
          val w = if (k == 0) math.pow(1 - a, t.toDouble)
          else a * math.pow(1 - a, (t - k).toDouble)
          math.round(w * v * 1e9)
        }
        terms.sum.toDouble / 1e9
      }
    val s1 = ewma(daily.map(_._2.toDouble))
    val s2 = ewma(s1)
    for ((r, i) <- out.zipWithIndex) {
      assert(r.getAs[Long]("actual") == daily(i)._2)
      assert(r.getAs[Double]("s1") == round6(s1(i)))
      assert(r.getAs[Double]("s2") == round6(s2(i)))
      val lvl = 2 * s1(i) - s2(i)
      val trd = a / (1 - a) * (s1(i) - s2(i))
      assert(r.getAs[Double]("level") == round6(lvl))
      assert(r.getAs[Double]("trend") == round6(trd))
      assert(r.getAs[Double]("forecast_7d") == round6(lvl + 7 * trd))
    }
    // DES with t0=y0: s1 tracks the series (first point exact)
    assert(out.head.getAs[Double]("s1") == daily.head._2.toDouble)
  }

  test("events_freshness: lags measured against the high-water mark") {
    val out = operators.Events.eventsFreshness(spark, sf).collect()
    val ev = Tables.events(spark, sf).select("event_type", "ts_s")
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("ts_s")))
    val hwm = ev.map(_._2).max
    val byType = ev.groupBy(_._1)
    assert(out.length == byType.size)
    for (r <- out) {
      val t = r.getAs[String]("event_type")
      val ts = byType(t).map(_._2)
      assert(r.getAs[Long]("last_ts_s") == ts.max)
      assert(r.getAs[Long]("lag_s") == hwm - ts.max)
      assert(r.getAs[Long]("events_last_hour") ==
        ts.count(_ > hwm - 3600).toLong)
      assert(r.getAs[Int]("stalled") ==
        (if (hwm - ts.max > 3600) 1 else 0))
    }
    // the type holding the high-water mark is never stalled
    assert(out.exists(r => r.getAs[Long]("lag_s") == 0L &&
      r.getAs[Int]("stalled") == 0))
  }

  test("events_value_icc matches a local ANOVA recompute") {
    val out = operators.Events.eventsValueIcc(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val per = Tables.events(spark, sf).filter("event_type = 'purchase'")
      .select("user_id", "value").collect()
      .map(x => (x.getAs[Long]("user_id"),
        math.round(x.getAs[Double]("value") * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val g = per.size.toLong
    val n = per.values.map(_.length.toLong).sum
    val s = per.values.map(_.sum).sum
    val sq = per.values.flatMap(_.map(v => v * v)).sum
    val bt = per.values.map { vs =>
      math.round(vs.sum.toDouble * vs.sum / vs.length * 1e-2)
    }.sum
    assert(r.getAs[Long]("n_users") == g)
    assert(r.getAs[Long]("n_purchases") == n)
    val ssb = bt.toDouble * 1e2 - s.toDouble * s / n
    val ssw = sq.toDouble - bt.toDouble * 1e2
    assert(r.getAs[Double]("ss_between") == round2(ssb / 1e4))
    assert(r.getAs[Double]("ss_within") == round2(ssw / 1e4))
    val msb = ssb / (g - 1); val msw = ssw / (n - g)
    val kbar = n.toDouble / g
    val icc = (msb - msw) / (msb + (kbar - 1.0) * msw)
    assert(r.getAs[Double]("icc") == round6(icc))
    assert(r.getAs[Double]("design_effect") ==
      round6(1.0 + (kbar - 1.0) * icc))
    // ICC is a correlation; design effect ≥ its floor when ICC ≥ 0
    assert(r.getAs[Double]("icc") <= 1.0)
  }
}
