package graft

/** Round-8 batch 13: daily-volume ACF, point-in-time feature join,
  * degree-tail histogram, confident-learning label noise. Local
  * recompute pins at sf0.001.
  */
class R8Batch13Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def eventRows(): Array[(Long, Long, String, Long)] =
    Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts_s").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ts_s")))

  test("events_autocorrelation matches a local gap-filled ACF recompute") {
    val out = operators.Events.eventsAutocorrelation(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag")) -> r)
      .toMap
    val ev = eventRows()
    val byType = ev.groupBy(_._3)
    for ((et, rows) <- byType) {
      val daily = rows.groupBy(_._4 / 86400).view.mapValues(_.size.toLong)
      val d0 = daily.keys.min; val d1 = daily.keys.max
      val series = (d0 to d1).map(d => daily.getOrElse(d, 0L))
      for (lag <- 1L to 7L) {
        val pairs = series.drop(lag.toInt).zip(series.dropRight(lag.toInt))
        val n = pairs.size.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val acf = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
          math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
            (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
        val r = out((et, lag))
        assert(r.getAs[Long]("n_pairs") == n, s"$et lag $lag")
        assert(r.getAs[Double]("acf") == round6(acf), s"$et lag $lag")
      }
    }
    assert(out.size == byType.size * 7)
  }

  test("events_pit_features never leaks the anchor or later events") {
    val out = operators.Events.eventsPitFeatures(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    val ev = eventRows()
    val byUser = ev.groupBy(_._2)
    val anchors = ev.filter(_._3 == "purchase")
    assert(out.size == anchors.length)
    for ((id, uid, _, ts) <- anchors) {
      val hist = byUser(uid)
      val prior = hist.filter(e => e._4 >= ts - 604800 && e._4 <= ts - 1)
      val views = prior.count(_._3 == "view").toLong
      // gap uses the (ts_s, event_id) total order over the full history
      val earlier = hist.filter(e =>
        e._4 < ts || (e._4 == ts && e._1 < id))
      val gap = if (earlier.isEmpty) -1L
        else ts - earlier.maxBy(e => (e._4, e._1))._4
      val r = out(id)
      assert(r.getAs[Long]("n_prior_7d") == prior.length.toLong, s"event $id")
      assert(r.getAs[Long]("n_views_7d") == views, s"event $id")
      assert(r.getAs[Long]("gap_s") == gap, s"event $id")
      // point-in-time correctness: the anchor itself is never counted
      assert(r.getAs[Long]("n_prior_7d") <
        hist.count(e => e._4 >= ts - 604800 && e._4 <= ts).toLong)
    }
  }

  test("graph_degree_hist bins exactly and the Hill tail is quantized") {
    val out = operators.Graph.graphDegreeHist(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
      .distinct
    val deg = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSeq.distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val bins = deg.values.groupBy(d => 63 - java.lang.Long.numberOfLeadingZeros(d))
      .view.mapValues(_.size.toLong).toMap
    val nTotal = deg.size.toLong
    val tail = deg.values.filter(_ >= 64)
    val lnsum = tail.map(d => math.round(1e6 * math.log(d / 64.0))).sum
    val alpha = round6(1.0 + tail.size.toDouble / (lnsum.toDouble / 1e6))
    assert(out.length == bins.size)
    for (r <- out) {
      val b = r.getAs[Long]("bin_l2")
      assert(r.getAs[Long]("n_nodes") == bins(b.toInt), s"bin $b")
      assert(r.getAs[Long]("d_lo") == (1L << b))
      assert(r.getAs[Long]("d_hi") == (1L << (b + 1)) - 1)
      assert(r.getAs[Double]("share") ==
        round6(bins(b.toInt).toDouble / nTotal))
      assert(r.getAs[Long]("n_tail") == tail.size.toLong)
      assert(r.getAs[Double]("hill_alpha") == alpha)
    }
  }

  test("quality_confident_joint matches a local Cleanlab-style recompute") {
    val out = operators.Governance.qualityConfidentJoint(spark, sf).collect()
      .map(r => (r.getAs[Long]("noisy_label"),
        r.getAs[Long]("confident_label")) -> r).toMap
    val sc = operators.TextAnalysis.qualityClassifier(spark, sf)
      .select("doc_id", "score").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val y = operators.TextAnalysis.textQuality(spark, sf)
      .select("doc_id", "quality_bucket").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (if (r.getAs[String]("quality_bucket") == "ok") 1L else 0L)).toMap
    val d = sc.map { case (id, s) =>
      (id, y(id), math.round(s * 1e6)) }.toSeq
    val n1 = d.count(_._2 == 1L).toLong
    val sum1 = d.filter(_._2 == 1L).map(_._3).sum
    val n0 = d.count(_._2 == 0L).toLong
    val sum0 = d.filter(_._2 == 0L).map(t => 1000000L - t._3).sum
    val cells = d.groupBy { case (_, yy, s) =>
      val ok1 = s * n1 >= sum1
      val ok0 = (1000000L - s) * n0 >= sum0
      val j = if (ok1 && ok0) (if (s >= 500000L) 1L else 0L)
        else if (ok1) 1L else if (ok0) 0L else -1L
      (yy, j)
    }.view.mapValues(_.size.toLong).toMap
    assert(out.size == cells.size)
    val rowTot = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    for (((yy, j), n) <- cells) {
      val r = out((yy, j))
      assert(r.getAs[Long]("n") == n, s"cell ($yy, $j)")
      assert(r.getAs[Double]("row_share") ==
        round6(n.toDouble / rowTot(yy)), s"cell ($yy, $j)")
    }
    // the estimate finds real label disagreement on this corpus
    assert(cells.keys.exists { case (yy, j) => j >= 0 && j != yy })
  }
}
