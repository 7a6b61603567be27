package graft

import java.security.MessageDigest

/** Round-8 batch 11: graph mixing/core structure, the Gopher rule
  * battery, DP count release, aspect-ratio bucketing. Local recompute
  * pins at sf0.001.
  */
class R8Batch11Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniform(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) / math.pow(16, 8)

  /** directed co-order edge set (both orientations) from lineitem. */
  private def localEdges(): Seq[(Long, Long)] = {
    val op = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
      .distinct
    op.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSeq.distinct
  }

  test("graph_assortativity matches a local Pearson-over-edges recompute") {
    val out = operators.Graph.graphAssortativity(spark, sf).collect()
    assert(out.length == 1)
    val e = localEdges()
    val deg = e.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val m2 = e.size.toLong
    val (sx, sy, sxy, sxx, syy) = e.foldLeft((0L, 0L, 0L, 0L, 0L)) {
      case ((a, b, c, d, f), (u, v)) =>
        val du = deg(u); val dv = deg(v)
        (a + du, b + dv, c + du * dv, d + du * du, f + dv * dv)
    }
    val num = m2.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val den = math.sqrt(
      (m2.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        (m2.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    assert(out(0).getAs[Long]("n_edges") == m2 / 2)
    assert(out(0).getAs[Double]("assortativity") == round6(num / den))
  }

  test("graph_kcore matches a local fixed-round peel simulation") {
    val rows = operators.Graph.graphKcore(spark, sf).collect()
      .map(r => r.getAs[Int]("round") -> r).toMap
    assert(rows.size == 6)
    val e = localEdges()
    var alive: Set[Long] = e.map(_._1).toSet
    for (r <- 1 to 6) {
      val dg = e.filter { case (u, v) => alive(u) && alive(v) }
        .groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
      val a = dg.filter(_._2 >= 80)
      alive = a.keySet
      val row = rows(r)
      assert(row.getAs[Long]("n_alive") == a.size.toLong, s"round $r")
      assert(row.getAs[Long]("min_deg") ==
        (if (a.isEmpty) 0L else a.values.min), s"round $r")
      assert(row.getAs[Long]("max_deg") ==
        (if (a.isEmpty) 0L else a.values.max), s"round $r")
      assert(row.getAs[Long]("sum_deg") == a.values.sum, s"round $r")
    }
    // the peel does real work on this corpus: round 1 already drops
    // nodes (otherwise the k threshold is a no-op at this SF)
    assert(rows(1).getAs[Long]("n_alive") < e.map(_._1).distinct.size)
  }

  test("text_gopher_rules matches a per-doc local recompute") {
    val out = operators.TextAnalysis.textGopherRules(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    assert(out.size == docs.length)
    val stops = Set("the", "a", "and", "or", "of")
    for ((id, text) <- docs) {
      val t = text.split("\\s+").toSeq
      val n = t.size.toLong
      val mwl = round6(t.map(_.length).sum.toDouble / n)
      val fu = round6(t.distinct.size.toDouble / n)
      val nsd = t.filter(stops).distinct.size.toLong
      val maxw = t.map(_.length).max.toLong
      val r = out(id)
      assert(r.getAs[Long]("n_words") == n, s"doc $id")
      assert(r.getAs[Double]("mean_word_len") == mwl, s"doc $id")
      assert(r.getAs[Double]("frac_unique") == fu, s"doc $id")
      assert(r.getAs[Long]("n_stop_distinct") == nsd, s"doc $id")
      assert(r.getAs[Long]("max_word_len") == maxw, s"doc $id")
      val flags = Seq(
        n >= 50 && n <= 100000,
        mwl >= 3.0 && mwl <= 10.0,
        nsd >= 2, fu >= 0.2, maxw <= 15)
      val names = Seq("r_word_count", "r_mean_word_len", "r_stopwords",
        "r_unique_frac", "r_max_word")
      for ((nm, f) <- names.zip(flags))
        assert(r.getAs[Int](nm) == (if (f) 1 else 0), s"doc $id $nm")
      assert(r.getAs[Int]("keep") == (if (flags.forall(identity)) 1 else 0))
    }
    // the battery discriminates on this corpus — both verdicts occur
    val keeps = out.values.map(_.getAs[Int]("keep")).toSet
    assert(keeps == Set(0, 1))
  }

  test("privacy_dp_counts matches the inverse-CDF Laplace recompute") {
    val out = operators.Governance.privacyDpCounts(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val cnt = Tables.events(spark, sf).select("event_type").collect()
      .map(_.getString(0)).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(out.size == cnt.size)
    for ((et, n) <- cnt) {
      val u = uniform(et + "#dp-release-1")
      val shift = u - 0.5
      val noise = -math.signum(shift) *
        math.log(math.max(1.0 - 2.0 * math.abs(shift), 1e-12))
      val r = out(et)
      assert(r.getAs[Long]("true_count") == n)
      assert(r.getAs[Double]("epsilon") == 1.0)
      assert(r.getAs[Double]("noise") == round6(noise), et)
      assert(r.getAs[Double]("dp_count") == round6(n + noise), et)
      // the ε=1 clamp bounds worst-case noise at ln(1e12) ≈ 27.6
      assert(math.abs(r.getAs[Double]("noise")) <= 27.7)
    }
  }

  test("mm_aspect_buckets matches a local nearest-ratio assignment") {
    val buckets = Seq(
      (1, 512, 2048), (2, 576, 1792), (3, 640, 1536), (4, 704, 1408),
      (5, 768, 1344), (6, 832, 1216), (7, 896, 1152), (8, 1024, 1024),
      (9, 1152, 896), (10, 1216, 832), (11, 1344, 768), (12, 1408, 704),
      (13, 1536, 640), (14, 1792, 576), (15, 2048, 512))
      .map { case (id, w, h) => (id, w, h, 1000L * w / h) }
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).getBytes("UTF-8").length.toLong)
    val assign = docs.map { nb =>
      val w = 64L + nb % 448
      val h = 64L + (nb / 7) % 448
      val ratio = 1000L * w / h
      val (id, bw, bh, _) = buckets.minBy { case (bid, _, _, br) =>
        (math.abs(ratio - br), bid.toLong)
      }
      (id, bw, bh, ratio)
    }
    val expect: Map[Int, (Int, Int, Long, Long, Long)] =
      assign.toSeq.groupBy(t => (t._1, t._2, t._3)).map {
        case ((id, bw, bh), rows) =>
          id -> ((bw, bh, rows.length.toLong,
            rows.map(_._4).min, rows.map(_._4).max))
      }
    val res = multimodal.BinaryColumns.aspectBuckets(spark, sf).collect()
    assert(res.length == expect.size)
    var total = 0L
    for (r <- res) {
      val id = r.getAs[Int]("bucket_id")
      val (bw, bh, n, mn, mx) = expect(id)
      assert(r.getAs[Int]("bucket_w") == bw && r.getAs[Int]("bucket_h") == bh)
      assert(r.getAs[Long]("n_items") == n, s"bucket $id")
      assert(r.getAs[Long]("n_full_batches") == n / 32)
      assert(r.getAs[Long]("n_remainder") == n % 32)
      assert(r.getAs[Long]("min_ratio_milli") == mn)
      assert(r.getAs[Long]("max_ratio_milli") == mx)
      total += n
    }
    // every image lands in exactly one bucket — batch coverage is total
    assert(total == docs.length.toLong)
  }
}
