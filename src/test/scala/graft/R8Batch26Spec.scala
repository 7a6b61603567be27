package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.{col, expr}

/** Round-8 batch 26: conversion p-chart, per-variant funnel A/B,
  * retention half-life, corpus dup-ngram mass. Local recompute pins
  * at sf0.001.
  */
class R8Batch26Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniform(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) / math.pow(16, 8)

  private def presence(): Array[(Long, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_s div 86400").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))

  test("events_conversion_pchart matches a local control-limit recompute") {
    val out = operators.Events.eventsConversionPchart(spark, sf).collect()
    val pres = presence()
    val buys = Tables.events(spark, sf).filter("event_type = 'purchase'")
      .select(col("user_id"), expr("ts_s div 86400").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"))).toSet
    val daily = pres.groupBy(_._2).view.mapValues { rows =>
      (rows.length.toLong, rows.count(buys).toLong)
    }.toMap
    val tb = daily.values.map(_._2).sum
    val ta = daily.values.map(_._1).sum
    val pbar = tb.toDouble / ta
    assert(out.length == daily.size)
    var nOoc = 0
    for (r <- out) {
      val d = r.getAs[Long]("day")
      val (n, x) = daily(d)
      assert(r.getAs[Long]("n_active") == n)
      assert(r.getAs[Long]("n_buyers") == x)
      val sigma = math.sqrt(pbar * (1 - pbar) / n)
      assert(r.getAs[Double]("conv_rate") == round6(x.toDouble / n))
      assert(r.getAs[Double]("center_line") == round6(pbar))
      assert(r.getAs[Double]("lcl") ==
        round6(math.max(pbar - 3 * sigma, 0.0)))
      assert(r.getAs[Double]("ucl") ==
        round6(math.min(pbar + 3 * sigma, 1.0)))
      val p = x.toDouble / n
      val ooc = p < pbar - 3 * sigma || p > pbar + 3 * sigma
      assert(r.getAs[Int]("out_of_control") == (if (ooc) 1 else 0))
      if (ooc) nOoc += 1
      // limits bracket the center line
      assert(r.getAs[Double]("lcl") <= r.getAs[Double]("center_line"))
      assert(r.getAs[Double]("center_line") <= r.getAs[Double]("ucl"))
    }
  }

  test("events_funnel_ab matches a local per-variant funnel recompute") {
    val out = operators.Events.eventsFunnelAb(spark, sf).collect()
      .map(r => r.getAs[String]("variant") -> r).toMap
    assert(out.keySet == Set("A", "B"))
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts_s").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("ts_s")))
    val byUser = ev.groupBy(_._1)
    val stages = byUser.map { case (uid, rows) =>
      def m(t: String): Option[Long] = {
        val xs = rows.filter(_._2 == t).map(_._3)
        if (xs.isEmpty) None else Some(xs.min)
      }
      val (ts, tv, tp) = (m("signup"), m("view"), m("purchase"))
      val s1 = ts.isDefined
      val s2 = s1 && tv.isDefined && tv.get >= ts.get
      val s3 = s2 && tp.isDefined && tp.get >= tv.get
      (if (uniform(uid.toString) < 0.5) "A" else "B",
        if (s1) 1L else 0L, if (s2) 1L else 0L, if (s3) 1L else 0L)
    }.toSeq
    val cells = stages.groupBy(_._1).view.mapValues { rs =>
      (rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum)
    }.toMap
    def z(xa: Long, na: Long, xb: Long, nb: Long): Double = {
      val pa = xa.toDouble / na; val pb = xb.toDouble / nb
      val pp = (xa + xb).toDouble / (na + nb)
      (pb - pa) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    }
    val (s1a, s2a, s3a) = cells("A")
    val (s1b, s2b, s3b) = cells("B")
    for (v <- Seq("A", "B")) {
      val r = out(v)
      val (n1, n2, n3) = cells(v)
      assert(r.getAs[Long]("n_signup") == n1)
      assert(r.getAs[Long]("n_view") == n2)
      assert(r.getAs[Long]("n_purchase") == n3)
      assert(r.getAs[Double]("view_rate") == round6(n2.toDouble / n1))
      assert(r.getAs[Double]("purchase_rate") == round6(n3.toDouble / n2))
      assert(r.getAs[Double]("z_view_step") ==
        round6(z(s2a, s1a, s2b, s1b)))
      assert(r.getAs[Double]("z_purchase_step") ==
        round6(z(s3a, s2a, s3b, s2b)))
      // funnel is monotone
      assert(n1 >= n2 && n2 >= n3)
    }
  }

  test("events_retention_halflife: censoring-free curve + decay fit") {
    val out = operators.Events.eventsRetentionHalflife(spark, sf).collect()
    val pres = presence()
    val maxDay = pres.map(_._2).max
    val cohort = pres.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val eligible = cohort.filter(_._2 <= maxDay - 7)
    val act = (1 to 7).map { t =>
      t.toLong -> eligible.count { case (u, c) =>
        pres.contains((u, c + t))
      }.toLong
    }.toMap
    assert(out.length == act.count(_._2 > 0))
    val pts = collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (r <- out) {
      val t = r.getAs[Long]("t")
      assert(r.getAs[Long]("n_cohort") == eligible.size.toLong)
      assert(r.getAs[Long]("n_active") == act(t), s"t=$t")
      assert(r.getAs[Double]("retention") ==
        round6(act(t).toDouble / eligible.size))
      pts += ((t.toDouble, math.log(act(t).toDouble / eligible.size)))
    }
    val n = pts.length
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val lambda = -(n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(out.head.getAs[Double]("lambda") - lambda) < 1e-5)
    if (lambda > 0)
      assert(math.abs(out.head.getAs[Double]("half_life_days") -
        math.log(2.0) / lambda) < 1e-3)
  }

  test("text_dup_ngram_mass matches a local 5-gram recompute") {
    val out = operators.TextAnalysis.textDupNgramMass(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").split("\\s+").toSeq))
      .filter(_._3.length >= 5)
    val occ = docs.flatMap { case (id, src, t) =>
      t.sliding(5).map(g => (id, src, g.mkString(" ")))
    }
    val docsPerGram = occ.map(o => (o._1, o._3)).distinct
      .groupBy(_._2).view.mapValues(_.length).toMap
    val bySrc = occ.groupBy(_._2)
    assert(out.length == bySrc.size)
    for (r <- out) {
      val src = r.getAs[String]("source")
      val os = bySrc(src)
      val dup = os.count(o => docsPerGram(o._3) >= 2).toLong
      assert(r.getAs[Long]("n_gram_occ") == os.length.toLong)
      assert(r.getAs[Long]("dup_occ") == dup)
      assert(r.getAs[Double]("dup_mass") ==
        round6(dup.toDouble / os.length))
      val grams = os.map(_._3).distinct
      assert(r.getAs[Long]("n_distinct_grams") == grams.length.toLong)
      assert(r.getAs[Long]("n_dup_grams") ==
        grams.count(g => docsPerGram(g) >= 2).toLong)
    }
  }
}
