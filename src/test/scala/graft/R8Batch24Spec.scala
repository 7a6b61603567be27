package graft

import org.apache.spark.sql.functions.{col, expr}

/** Round-8 batch 24: weekend conversion effect, open-order aging,
  * char-entropy compressibility, feature co-usage matrix. Local
  * recompute pins at sf0.001.
  */
class R8Batch24Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("events_weekend_effect matches a local two-proportion recompute") {
    val out = operators.Events.eventsWeekendEffect(spark, sf).collect()
      .map(r => r.getAs[Int]("is_weekend") -> r).toMap
    assert(out.keySet == Set(0, 1))
    val pres = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_s div 86400").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
    val buys = Tables.events(spark, sf).filter("event_type = 'purchase'")
      .select(col("user_id"), expr("ts_s div 86400").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"))).toSet
    val cells = pres.groupBy { case (_, d) =>
      if (Set(0L, 6L)((d + 4) % 7)) 1 else 0
    }
    val stats = cells.view.mapValues { rows =>
      (rows.length.toLong, rows.count(buys).toLong)
    }.toMap
    val (n1, b1) = stats(1); val (n0, b0) = stats(0)
    val p1 = b1.toDouble / n1; val p0 = b0.toDouble / n0
    val pp = (b1 + b0).toDouble / (n1 + n0)
    val z = (p1 - p0) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n0))
    for ((w, (n, b)) <- stats) {
      val r = out(w)
      assert(r.getAs[Long]("n_user_days") == n)
      assert(r.getAs[Long]("n_buyer_days") == b)
      assert(r.getAs[Double]("conv_rate") == round6(b.toDouble / n))
      assert(r.getAs[Double]("weekend_lift") == round6(p1 - p0))
      assert(r.getAs[Double]("z_pooled") == round6(z))
    }
  }

  test("orders_aging matches a local exact-cent recompute") {
    val out = operators.Olap.ordersAging(spark, sf).collect()
    // order dates normalized to epoch DAYS in the projection so the
    // local recompute never touches timestamp units
    val raw = Tables.orders(spark, sf)
      .select(col("o_orderstatus"),
        expr("datediff(o_orderdate, DATE '1992-01-01')")
          .cast("long").as("od"),
        col("o_totalprice")).collect()
      .map(r => (r.getAs[String]("o_orderstatus"), r.getAs[Long]("od"),
        math.round(r.getAs[Double]("o_totalprice") * 100)))
    val ref = raw.map(_._2).max
    def bucketOf(age: Long): Int =
      if (age <= 30) 0 else if (age <= 90) 1 else if (age <= 180) 2
      else if (age <= 365) 3 else 4
    val open = raw.filter(_._1 != "F").map { case (s, od, vc) =>
      ((s, bucketOf(ref - od)), vc)
    }
    val byCell = open.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val total = open.map(_._2).sum
    assert(out.length == byCell.size)
    for (r <- out) {
      val cell = (r.getAs[String]("status"),
        r.getAs[Long]("bucket_order").toInt)
      val (n, vc) = byCell(cell)
      assert(r.getAs[Long]("n_orders") == n, s"cell $cell")
      assert(r.getAs[Double]("open_value") ==
        BigDecimal(vc.toDouble / 100.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Double]("value_share") ==
        round6(vc.toDouble / total))
    }
  }

  test("text_char_entropy matches a local distribution recompute") {
    val out = operators.TextAnalysis.textCharEntropy(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("source", "text")
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    val bySrc = docs.groupBy(_._1)
    assert(out.length == bySrc.size)
    for (r <- out) {
      val src = r.getAs[String]("source")
      val counts = bySrc(src).flatMap(_._2.toCharArray)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = counts.values.sum
      assert(r.getAs[Long]("n_chars") == n)
      assert(r.getAs[Long]("n_distinct") == counts.size.toLong)
      val sU9 = counts.values.map { c =>
        val p = c.toDouble / n
        math.round(-p * (math.log(p) / math.log(2.0)) * 1e9)
      }.sum
      assert(r.getAs[Double]("entropy_bits") == round6(sU9.toDouble / 1e9))
      assert(r.getAs[Double]("est_compression_ratio") ==
        round6(sU9.toDouble / 1e9 / 8.0))
      // natural-text sanity: entropy within (1, log2 alphabet]
      assert(r.getAs[Double]("entropy_bits") > 1.0)
      assert(r.getAs[Double]("entropy_bits") <=
        math.log(counts.size.toDouble) / math.log(2.0) + 1e-6)
    }
  }

  test("events_type_overlap matches a local user-set recompute") {
    val out = operators.Events.eventsTypeOverlap(spark, sf).collect()
    val tu = Tables.events(spark, sf).select("event_type", "user_id")
      .distinct().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
    val sets = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val expected = for {
      a <- types; b <- types if a < b
      both = (sets(a) intersect sets(b)).size.toLong if both > 0
    } yield ((a, b), both)
    assert(out.length == expected.length)
    for (r <- out) {
      val key = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val both = (sets(key._1) intersect sets(key._2)).size.toLong
      val (na, nb) = (sets(key._1).size.toLong, sets(key._2).size.toLong)
      assert(r.getAs[Long]("n_both") == both, s"pair $key")
      assert(r.getAs[Long]("n_a") == na)
      assert(r.getAs[Long]("n_b") == nb)
      assert(r.getAs[Double]("jaccard") ==
        round6(both.toDouble / (na + nb - both)))
      assert(r.getAs[Double]("overlap_coef") ==
        round6(both.toDouble / math.min(na, nb)))
    }
  }
}
