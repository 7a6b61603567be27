package graft

import java.security.MessageDigest

/** Round-8 batch 21: garbage-text screen, PII incidence audit,
  * supplier-concentration HHI, cross-source dup matrix. Local
  * recompute pins at sf0.001.
  */
class R8Batch21Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("text_garbage_score matches a local char-heuristic recompute") {
    val out = operators.TextAnalysis.textGarbageScore(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val docs = Tables.documents(spark, sf).select("source", "text")
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
      .filter(_._2.nonEmpty)
    val perDoc = docs.map { case (src, t) =>
      val nChars = t.length.toLong
      val nAlpha = t.count(c => (c >= 'a' && c <= 'z') ||
        (c >= 'A' && c <= 'Z')).toLong
      val nDigit = t.count(c => c >= '0' && c <= '9').toLong
      val runs = "[bcdfghjklmnpqrstvwxzBCDFGHJKLMNPQRSTVWXZ]+".r.findAllIn(t).map(_.length)
      val maxRun = if (runs.isEmpty) 0L else runs.max.toLong
      val aU6 = math.round(nAlpha * 1e6 / nChars)
      val dU6 = math.round(nDigit * 1e6 / nChars)
      val garbage = aU6 < 550000L || dU6 > 300000L || maxRun >= 8L
      (src, aU6, dU6, maxRun, garbage)
    }
    val bySrc = perDoc.groupBy(_._1)
    assert(out.keySet == bySrc.keySet)
    for ((src, rows) <- bySrc) {
      val r = out(src)
      assert(r.getAs[Long]("n_docs") == rows.length.toLong)
      assert(r.getAs[Long]("n_flagged") == rows.count(_._5).toLong)
      assert(r.getAs[Double]("flag_share") ==
        round6(rows.count(_._5).toDouble / rows.length))
      assert(r.getAs[Double]("avg_alpha_ratio") ==
        round6(rows.map(_._2).sum.toDouble / rows.length / 1e6))
      assert(r.getAs[Double]("avg_digit_ratio") ==
        round6(rows.map(_._3).sum.toDouble / rows.length / 1e6))
      assert(r.getAs[Long]("max_consonant_run") == rows.map(_._4).max)
    }
  }

  test("text_pii_incidence agrees with the per-doc scrub counts") {
    val out = operators.TextAnalysis.textPiiIncidence(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // reuse the per-doc scrub relation as truth: same detectors by
    // construction, so the audit must be its exact rollup
    val scrub = operators.TextAnalysis.textPiiScrub(spark, sf)
      .select("doc_id", "n_emails", "n_phones", "n_ips").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"),
          r.getAs[Int]("n_ips"))).toMap
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source"))
      .toMap
    val bySrc = scrub.toSeq.groupBy { case (id, _) => srcOf(id) }
    assert(out.keySet == bySrc.keySet)
    for ((src, rows) <- bySrc) {
      val r = out(src)
      val (es, ps, ips) = (rows.map(_._2._1), rows.map(_._2._2),
        rows.map(_._2._3))
      assert(r.getAs[Long]("n_docs") == rows.length.toLong)
      assert(r.getAs[Long]("docs_with_email") == es.count(_ > 0).toLong)
      assert(r.getAs[Long]("n_email_matches") == es.map(_.toLong).sum)
      assert(r.getAs[Long]("docs_with_phone") == ps.count(_ > 0).toLong)
      assert(r.getAs[Long]("n_phone_matches") == ps.map(_.toLong).sum)
      assert(r.getAs[Long]("docs_with_ip") == ips.count(_ > 0).toLong)
      assert(r.getAs[Long]("n_ip_matches") == ips.map(_.toLong).sum)
      val any = rows.count { case (_, (e, p, i)) => e > 0 || p > 0 || i > 0 }
      assert(r.getAs[Long]("docs_with_any") == any.toLong)
      assert(r.getAs[Double]("any_pii_share") ==
        round6(any.toDouble / rows.length))
    }
  }

  test("part_supplier_hhi matches a local exact-BIGINT recompute") {
    val out = operators.Olap.partSupplierHhi(spark, sf).collect()
    val ps = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .map(r => ((r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")),
        r.getAs[Double]("l_quantity").toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val perPart = ps.groupBy(_._1._1).map { case (_, sup) =>
      val qt = sup.map(_._2).sum
      val sq2 = sup.map(v => v._2 * v._2).sum
      val hhiU6 = math.round(sq2.toDouble * 1e6 / (qt.toDouble * qt.toDouble))
      (math.min(10L, hhiU6 / 100000), sup.size.toLong, hhiU6)
    }.toSeq
    val byBucket = perPart.groupBy(_._1)
    assert(out.length == byBucket.size)
    for (r <- out) {
      val b = r.getAs[Long]("bucket")
      val rows = byBucket(b)
      assert(r.getAs[Long]("n_parts") == rows.length.toLong)
      assert(r.getAs[Double]("share") ==
        round6(rows.length.toDouble / perPart.length))
      assert(r.getAs[Double]("avg_suppliers") ==
        round6(rows.map(_._2).sum.toDouble / rows.length))
      assert(r.getAs[Double]("avg_hhi") ==
        round6(rows.map(_._3).sum.toDouble / rows.length / 1e6))
    }
    // sole-sourced parts (HHI = 1) land in bucket 10
    if (perPart.exists(_._3 == 1000000L))
      assert(out.exists(_.getAs[Long]("bucket") == 10L))
  }

  test("dedup_cross_source: diagonal is the census, overlap bounded") {
    val out = operators.Dedup.dedupCrossSource(spark, sf).collect()
    val hs = Tables.documents(spark, sf).select("text", "source")
      .collect()
      .map(r => (md5hex(r.getAs[String]("text")), r.getAs[String]("source")))
      .distinct
    val per = hs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val shared = hs.groupBy(_._1).values.toSeq.flatMap { members =>
      val srcs = members.map(_._2).toSeq
      for (a <- srcs; b <- srcs if a <= b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.length == shared.size)
    for (r <- out) {
      val key = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(r.getAs[Long]("n_shared") == shared(key), s"pair $key")
      assert(r.getAs[Long]("n_a") == per(key._1))
      assert(r.getAs[Long]("n_b") == per(key._2))
      assert(r.getAs[Double]("overlap_coef") ==
        round6(shared(key).toDouble / math.min(per(key._1), per(key._2))))
      // diagonal: a source shares every one of its hashes with itself
      if (key._1 == key._2)
        assert(r.getAs[Long]("n_shared") == per(key._1))
      // overlap coefficient is a coefficient
      assert(r.getAs[Double]("overlap_coef") <= 1.0)
    }
  }
}
