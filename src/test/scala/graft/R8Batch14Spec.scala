package graft

/** Round-8 batch 14: multiwindow SLO burn, Laspeyres price index,
  * clustering NMI. Local recompute pins at sf0.001.
  */
class R8Batch14Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("events_slo_burn matches a local calendar-window recompute") {
    val out = operators.Events.eventsSloBurn(spark, sf).collect()
      .map(r => r.getAs[Long]("hour_ts") -> r).toMap
    val ev = Tables.events(spark, sf).select("event_type", "ts_s").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("ts_s") / 3600))
    val byHour = ev.groupBy(_._2)
    val h0 = byHour.keys.min; val h1 = byHour.keys.max
    assert(out.size == (h1 - h0 + 1))
    for (h <- h0 to h1) {
      val cur = byHour.getOrElse(h, Array.empty)
      val nTot = cur.length.toLong
      val nErr = cur.count(_._1 == "error").toLong
      val win = (math.max(h0, h - 5) to h)
        .flatMap(hh => byHour.getOrElse(hh, Array.empty))
      val t6 = win.size.toLong
      val e6 = win.count(_._1 == "error").toLong
      val rate1 = if (nTot > 0) round6(nErr.toDouble / nTot) else 0.0
      val rate6 = if (t6 > 0) round6(e6.toDouble / t6) else 0.0
      val r = out(h)
      assert(r.getAs[Long]("n_total") == nTot, s"hour $h")
      assert(r.getAs[Long]("n_err") == nErr, s"hour $h")
      assert(r.getAs[Double]("rate1") == rate1, s"hour $h")
      assert(r.getAs[Double]("rate6") == rate6, s"hour $h")
      assert(r.getAs[Double]("burn1") == round6(rate1 / 0.01), s"hour $h")
      assert(r.getAs[Double]("burn6") == round6(rate6 / 0.01), s"hour $h")
      val page = rate1 / 0.01 >= 14.4 && rate6 / 0.01 >= 6.0
      assert(r.getAs[Int]("page") == (if (page) 1 else 0), s"hour $h")
    }
    // the multiwindow policy actually pages on this corpus (error
    // traffic exists) and does NOT page every hour (it discriminates)
    val pages = out.values.map(_.getAs[Int]("page")).toSet
    assert(pages.contains(0))
  }

  test("orders_price_index is 1.0 at base and matches a local Laspeyres") {
    val out = operators.Olap.ordersPriceIndex(spark, sf).collect()
      .map(r => r.getAs[Long]("ym") -> r).toMap
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")
      .collect()
      .map { r =>
        val d = r.getAs[java.time.LocalDateTime]("l_shipdate")
        (d.getYear * 100L + d.getMonthValue, r.getAs[Long]("l_partkey"),
          r.getAs[Double]("l_quantity"), r.getAs[Double]("l_extendedprice"))
      }
    val m = li.groupBy(t => (t._1, t._2)).map { case ((ym, pk), rows) =>
      val q = rows.map(_._3).sum
      val e = rows.map(_._4).sum
      (ym, pk, math.round(q), math.round(100.0 * e / q))
    }.toSeq
    val ym0 = m.map(_._1).min
    val base = m.filter(_._1 == ym0).map(t => t._2 -> (t._3, t._4)).toMap
    val expect = m.filter(t => base.contains(t._2)).groupBy(_._1).map {
      case (ym, rows) =>
        val num = rows.map(t => t._4 * base(t._2)._1).sum
        val den = rows.map(t => base(t._2)._2 * base(t._2)._1).sum
        (ym, rows.size.toLong, round6(num.toDouble / den))
    }
    assert(out.size == expect.size)
    for ((ym, nParts, idx) <- expect) {
      val r = out(ym)
      assert(r.getAs[Long]("n_parts") == nParts, s"ym $ym")
      assert(r.getAs[Double]("price_index") == idx, s"ym $ym")
    }
    assert(out(ym0).getAs[Double]("price_index") == 1.0)
  }

  test("embed_cluster_nmi matches a quantized-entropy recompute") {
    val out = operators.Similarity.embedClusterNmi(spark, sf).collect()
    assert(out.length == 1)
    val assign = operators.Similarity.clusterKmeans(spark, sf)
      .select("vec_id", "cluster").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    val lbl = Tables.embeddings(spark, sf).select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val cells = assign.toSeq.map { case (v, c) => ((c, lbl(v)), 1L) }
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nI = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nJ = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nn = cells.values.sum
    val miU9 = cells.map { case ((i, j), nij) =>
      math.round(1e9 * (nij.toDouble / nn) *
        math.log(nn.toDouble * nij / (nI(i).toDouble * nJ(j))))
    }.sum
    val hcU9 = nI.values.map(ni => math.round(-1e9 * (ni.toDouble / nn) *
      math.log(ni.toDouble / nn))).sum
    val hlU9 = nJ.values.map(njv => math.round(-1e9 * (njv.toDouble / nn) *
      math.log(njv.toDouble / nn))).sum
    val r = out(0)
    assert(r.getAs[Long]("n_cells") == cells.size.toLong)
    assert(r.getAs[Double]("mutual_info") == round6(miU9 / 1e9))
    assert(r.getAs[Double]("h_cluster") == round6(hcU9 / 1e9))
    assert(r.getAs[Double]("h_label") == round6(hlU9 / 1e9))
    val nmi = round6(miU9.toDouble / math.sqrt(hcU9.toDouble * hlU9.toDouble))
    assert(r.getAs[Double]("nmi") == nmi)
    // NMI is a real number in [0, 1] on this corpus
    assert(r.getAs[Double]("nmi") >= 0.0 && r.getAs[Double]("nmi") <= 1.0)
  }
}
