package graft

import org.apache.spark.sql.functions.col

/** Round-8 batch 30: chi-square independence, one-way ANOVA, exact
  * Gini, term burstiness. Local recompute pins at sf0.001.
  */
class R8Batch30Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def stateOf(ck: Long, nk: Long): String = {
    if (ck % 5 == 0) return "INVALID"
    val p = (nk * 100 + ck % 100).toInt
    if ((p >= 1000 && p <= 2599) || (p >= 2619 && p <= 2899) ||
      (p >= 2921 && p <= 2999)) "NSW"
    else if ((p >= 200 && p <= 299) || (p >= 2600 && p <= 2618) ||
      (p >= 2900 && p <= 2920)) "ACT"
    else if ((p >= 3000 && p <= 3999) || (p >= 8000 && p <= 8999)) "VIC"
    else if ((p >= 4000 && p <= 4999) || (p >= 9000 && p <= 9999)) "QLD"
    else if (p >= 5000 && p <= 5999) "SA"
    else if (p >= 6000 && p <= 6999) "WA"
    else if (p >= 7000 && p <= 7999) "TAS"
    else if (p >= 800 && p <= 999) "NT"
    else "UNKNOWN"
  }

  test("clean_state_type_chi2 matches a local contingency recompute") {
    val out = operators.Cleaning.cleanStateTypeChi2(spark, sf).collect()
    val rows = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_mktsegment").collect()
      .map(r => (stateOf(r.getAs[Long]("c_custkey"),
        r.getAs[Number]("c_nationkey").longValue),
        r.getAs[String]("c_mktsegment")))
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowM = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colM = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    assert(out.length == cells.size)
    val terms: Map[(String, String), (Long, Double, Long)] =
      cells.map { case ((s, t), c) =>
        val e = rowM(s).toDouble * colM(t) / n
        ((s, t), (c, e, math.round((c - e) * (c - e) / e * 1e6)))
      }
    val chi2TotU6 = terms.values.map(_._3).sum
    for (r <- out) {
      val key = (r.getAs[String]("state"), r.getAs[String]("entity_type"))
      val (c, e, u6) = terms(key)
      assert(r.getAs[Long]("n") == c)
      assert(r.getAs[Double]("expected") == round6(e))
      assert(r.getAs[Double]("chi2_term") == round6(u6 / 1e6))
      assert(r.getAs[Double]("chi2_total") == round6(chi2TotU6 / 1e6))
      assert(r.getAs[Long]("dof") ==
        (rowM.size - 1).toLong * (colM.size - 1))
    }
  }

  test("events_value_anova matches a local F recompute") {
    val out = operators.Events.eventsValueAnova(spark, sf).collect()
    val rows = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"),
        math.round(r.getAs[Double]("value") * 100)))
    val byType = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val g = byType.size.toLong
    val n = rows.length.toLong
    val s = rows.map(_._2).sum
    val sq = rows.map(r => r._2 * r._2).sum
    val bt = byType.values.map { vs =>
      math.round(vs.sum.toDouble * vs.sum / vs.length * 1e-2)
    }.sum
    val ssb = bt.toDouble * 1e2 - s.toDouble * s / n
    val ssw = sq.toDouble - bt.toDouble * 1e2
    val f = (ssb / (g - 1)) / (ssw / (n - g))
    assert(out.length == byType.size)
    for (r <- out) {
      val t = r.getAs[String]("event_type")
      val vs = byType(t)
      assert(r.getAs[Long]("n") == vs.length.toLong)
      assert(r.getAs[Double]("mean_value") ==
        round6(vs.sum.toDouble / vs.length / 100.0))
      assert(r.getAs[Double]("f_stat") == round6(f))
      assert(r.getAs[Double]("eta_sq") == round6(ssb / (ssb + ssw)))
      assert(r.getAs[Long]("dof_between") == g - 1)
      assert(r.getAs[Long]("dof_within") == n - g)
    }
  }

  test("orders_spend_gini matches a brute-force pairwise recompute") {
    val out = operators.Olap.ordersSpendGini(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val spend = Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice").collect()
      .map(x => (x.getAs[Long]("o_custkey"),
        math.round(x.getAs[Double]("o_totalprice") * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val vs = spend.values.map(_ / 100).toSeq.sorted // whole dollars
    val n = vs.length
    assert(r.getAs[Long]("n_customers") == n.toLong)
    // rank identity on the sorted whole-dollar values
    val srx = vs.zipWithIndex.map { case (v, i) => v * (i + 1L) }.sum
    val sD = vs.sum
    val gini = (2.0 * srx - (n + 1.0) * sD) / (n.toDouble * sD)
    assert(r.getAs[Double]("gini") == round6(gini))
    // brute-force mean-absolute-difference cross-check
    val mad = (for (a <- vs; b <- vs) yield math.abs(a - b)).sum.toDouble /
      (n.toDouble * n)
    val giniMad = mad / (2.0 * sD / n)
    assert(math.abs(gini - giniMad) < 1e-9)
    assert(r.getAs[Double]("gini") >= 0.0 && r.getAs[Double]("gini") < 1.0)
  }

  test("text_term_burstiness matches a local binomial-null recompute") {
    val out = operators.TextAnalysis.textTermBurstiness(spark, sf)
      .collect().sortBy(_.getAs[Int]("rank"))
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getAs[String]("text").split("\\s+").toSeq)
    val nd = docs.length
    val cw = docs.flatten.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val df = docs.flatMap(_.distinct).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val top = cw.toSeq.sortBy { case (w, c) => (-c, w) }.take(20)
    assert(out.length == top.length)
    for ((r, (w, c)) <- out.zip(top)) {
      assert(r.getAs[String]("term") == w)
      assert(r.getAs[Long]("cw") == c)
      assert(r.getAs[Long]("df") == df(w))
      val exp = nd * (1.0 - math.pow(1.0 - 1.0 / nd, c.toDouble))
      assert(r.getAs[Double]("expected_df") == round6(exp))
      assert(r.getAs[Double]("burstiness") == round6(round6(exp) / df(w)))
      // expected df can never exceed the doc count
      assert(r.getAs[Double]("expected_df") <= nd + 1e-6)
    }
  }
}
