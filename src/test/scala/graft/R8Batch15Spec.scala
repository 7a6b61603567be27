package graft

import java.security.MessageDigest

/** Round-8 batch 15: code detection, layout skew, AQP estimator,
  * sequential always-valid A/B. Local recompute pins at sf0.001.
  */
class R8Batch15Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniform(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) / math.pow(16, 8)

  test("text_code_detect matches a per-doc feature recompute") {
    val out = operators.TextAnalysis.textCodeDetect(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val kw = Set("join", "hash", "scan", "sort", "merge", "filter")
    val stop = Set("the", "a", "and", "or", "of")
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    for ((id, text) <- docs) {
      val t = text.split("\\s+").toSeq
      val nSym = text.count(c => !c.isLetterOrDigit && !c.isWhitespace)
      val kwR = round6(t.count(kw).toDouble / t.size)
      val stR = round6(t.count(stop).toDouble / t.size)
      val r = out(id)
      assert(r.getAs[Double]("sym_ratio") ==
        round6(nSym.toDouble / text.length), s"doc $id")
      assert(r.getAs[Double]("kw_ratio") == kwR, s"doc $id")
      assert(r.getAs[Double]("stop_ratio") == stR, s"doc $id")
      val v = if (kwR >= 0.18 && stR <= 0.08) "code"
        else if (kwR >= 0.10) "mixed" else "prose"
      assert(r.getAs[String]("verdict") == v, s"doc $id")
    }
    // the detector discriminates on this corpus
    assert(out.values.map(_.getAs[String]("verdict")).toSet.size >= 2)
  }

  test("layout_skew_report conserves bytes and recommends sane files") {
    val out = operators.Quality.layoutSkewReport(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[String]("text").getBytes("UTF-8").length.toLong))
    val per = docs.groupBy(_._1).view
      .mapValues(rows => (rows.length.toLong, rows.map(_._2).sum)).toMap
    val total = per.values.map(_._2).sum
    assert(out.length == per.size)
    var shareSum = 0.0
    for (r <- out) {
      val (n, b) = per(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("bytes") == b)
      assert(r.getAs[Double]("byte_share") == round6(b.toDouble / total))
      assert(r.getAs[Double]("skew_vs_mean") ==
        round6(b.toDouble * per.size / total))
      assert(r.getAs[Long]("files_recommended") ==
        math.max(1L, (b + (1L << 20) - 1) / (1L << 20)))
      shareSum += r.getAs[Double]("byte_share")
    }
    assert(math.abs(shareSum - 1.0) < 1e-4)
  }

  test("table_estimate expansion estimator is unbiased-shaped and CI-covered") {
    val out = operators.Sketches.tableEstimate(spark, sf).collect()
    assert(out.length == 1)
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      .collect()
      .map(r => (uniform(s"${r.getAs[Long]("l_orderkey")}:${r.getAs[Long]("l_linenumber")}#aqp"),
        r.getAs[Double]("l_extendedprice") * (1.0 - r.getAs[Double]("l_discount"))))
    val sample = li.filter(_._1 < 0.1)
    val r = out(0)
    assert(r.getAs[Long]("n_sample") == sample.length.toLong)
    assert(r.getAs[Long]("n_exact") == li.length.toLong)
    assert(r.getAs[Long]("n_est") == math.round(sample.length / 0.1))
    // the 10% estimate lands within 15% of truth on this corpus
    assert(r.getAs[Double]("rel_err") < 0.15)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("ci_hi"))
  }

  test("events_sequential_msprt p-values are monotone and match recompute") {
    val out = operators.Events.eventsSequentialMsprt(spark, sf).collect()
    val byDay = out.map(r => r.getAs[Long]("day") -> r).toMap
    val ev = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id", "value", "ts_s").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"),
        r.getAs[Long]("ts_s") / 86400))
    val d0 = ev.map(_._3).min; val d1 = ev.map(_._3).max
    assert(out.length == (d1 - d0 + 1))
    // local recompute with the same daily micro-unit quantization
    val daily = ev.groupBy(e => (e._3, if (uniform(e._1.toString) < 0.5) "A" else "B"))
      .view.mapValues { rows =>
        (rows.length.toLong,
          math.round(round6(rows.map(_._2).sum) * 1e6),
          math.round(round6(rows.map(v => v._2 * v._2).sum) * 1e6))
      }.toMap
    var maxLam = Double.NaN
    var prevP = Double.PositiveInfinity
    for (d <- d0 to d1) {
      def cum(v: String) = {
        val rows = (d0 to d).map(dd => daily.getOrElse((dd, v), (0L, 0L, 0L)))
        (rows.map(_._1).sum, rows.map(_._2).sum, rows.map(_._3).sum)
      }
      val (na, sa, ssa) = cum("A"); val (nb, sb, ssb) = cum("B")
      val r = byDay(d)
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
      if (na >= 2 && nb >= 2) {
        val ma = sa.toDouble / 1e6 / na; val mb = sb.toDouble / 1e6 / nb
        val va = ssa.toDouble / 1e6 / na - ma * ma
        val vb = ssb.toDouble / 1e6 / nb - mb * mb
        val vn = va / na + vb / nb
        if (vn > 0) {
          val delta = mb - ma
          val lam = math.sqrt(vn / (vn + 0.01)) *
            math.exp(delta * delta * 0.01 / (2.0 * vn * (vn + 0.01)))
          assert(r.getAs[Double]("lambda") == round6(lam), s"day $d")
          maxLam = if (maxLam.isNaN) lam else math.max(maxLam, lam)
          val p = round6(math.min(1.0, 1.0 / maxLam))
          assert(r.getAs[Double]("p_always") == p, s"day $d")
          // always-valid: the p sequence never increases
          assert(p <= prevP + 1e-12, s"day $d")
          prevP = p
        }
      }
    }
  }
}
