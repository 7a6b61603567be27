package graft

import java.security.MessageDigest

/** Round-8 batch 17: Bayesian conversion A/B, winsorized/trimmed
  * robust means, k-fold assignment audit, pHash LSH banding. Local
  * recompute pins at sf0.001.
  */
class R8Batch17Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniform(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) / math.pow(16, 8)

  test("events_bayesian_ab matches a local grid-quadrature recompute") {
    val r = operators.Events.eventsBayesianAb(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val byUser = Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .groupBy(_.getAs[Long]("user_id")).view
      .mapValues(_.exists(_.getAs[String]("event_type") == "purchase"))
    val (na, xa, nb, xb) = byUser.foldLeft((0L, 0L, 0L, 0L)) {
      case ((a, x, b, y), (uid, conv)) =>
        if (uniform(uid.toString) < 0.5)
          (a + 1, x + (if (conv) 1L else 0L), b, y)
        else (a, x, b + 1, y + (if (conv) 1L else 0L))
    }
    assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("x_a") == xa)
    assert(row.getAs[Long]("n_b") == nb && row.getAs[Long]("x_b") == xb)
    assert(row.getAs[Double]("post_mean_a") ==
      round6((xa + 1).toDouble / (na + 2)))
    assert(row.getAs[Double]("post_mean_b") ==
      round6((xb + 1).toDouble / (nb + 2)))
    // grid quadrature recompute
    def weights(n: Long, x: Long): Array[Double] = {
      val l = (1 to 199).map { k =>
        val p = k / 200.0
        x * math.log(p) + (n - x) * math.log(1.0 - p)
      }.toArray
      val m = l.max
      val e = l.map(v => math.exp(v - m))
      val s = e.sum
      e.map(_ / s)
    }
    val wa = weights(na, xa)
    val wb = weights(nb, xb)
    var pb = 0.0
    for (i <- 0 until 199; j <- 0 until 199) {
      if (i > j) pb += wb(i) * wa(j)
      else if (i == j) pb += wb(i) * wa(j) * 0.5
    }
    assert(math.abs(row.getAs[Double]("p_b_gt_a") - pb) < 1e-5)
    assert(row.getAs[Double]("p_b_gt_a") >= 0.0 &&
      row.getAs[Double]("p_b_gt_a") <= 1.0)
  }

  test("events_winsorized_ab matches a local robust-mean recompute") {
    val out = operators.Events.eventsWinsorizedAb(spark, sf).collect()
      .map(r => r.getAs[String]("variant") -> r).toMap
    assert(out.keySet == Set("A", "B"))
    val ev = Tables.events(spark, sf).filter("event_type = 'purchase'")
      .select("user_id", "value").collect()
      .map(r => (if (uniform(r.getAs[Long]("user_id").toString) < 0.5) "A"
                 else "B",
        math.round(r.getAs[Double]("value") * 100)))
    for (v <- Seq("A", "B")) {
      val vs = ev.filter(_._1 == v).map(_._2).sorted
      val n = vs.length
      val cap = vs.zipWithIndex.collectFirst {
        case (x, i) if (i + 1) * 100L >= n.toLong * 99 => x
      }.get
      val r = out(v)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("cap_p99") == cap / 100.0)
      assert(r.getAs[Double]("mean_raw") ==
        round6(vs.map(_.toDouble).sum / n / 100.0))
      assert(r.getAs[Double]("mean_wins") ==
        round6(vs.map(x => math.min(x, cap).toDouble).sum / n / 100.0))
      val kept = vs.filter(_ <= cap)
      assert(r.getAs[Long]("n_trim") == kept.length)
      assert(r.getAs[Double]("mean_trim") ==
        round6(kept.map(_.toDouble).sum / kept.length / 100.0))
      // robustification only ever lowers the mean
      assert(r.getAs[Double]("mean_trim") <= r.getAs[Double]("mean_wins"))
      assert(r.getAs[Double]("mean_wins") <= r.getAs[Double]("mean_raw"))
    }
  }

  test("sample_kfold is grid-complete and matches local fold hashing") {
    val out = operators.Sampling.sampleKfold(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val sources = docs.map(_._2).distinct
    assert(out.length == 5 * sources.length)
    val folds = docs.map { case (id, src) =>
      (math.floor(uniform(s"$id#fold") * 5).toLong, src)
    }
    val cellCounts = folds.groupBy(identity).view.mapValues(_.length.toLong)
    val bySource = docs.groupBy(_._2).view.mapValues(_.length.toLong)
    for (r <- out) {
      val fold = r.getAs[Long]("fold")
      val src = r.getAs[String]("source")
      val n = cellCounts.getOrElse((fold, src), 0L)
      val nSrc = bySource(src)
      assert(r.getAs[Long]("n") == n, s"cell ($fold, $src)")
      assert(r.getAs[Long]("n_source") == nSrc)
      assert(r.getAs[Double]("share_of_source") ==
        round6(n.toDouble / nSrc))
      val exp = nSrc / 5.0
      assert(r.getAs[Double]("chi2_term") ==
        round6((n - exp) * (n - exp) / exp))
    }
    // folds partition each source exactly
    for (src <- sources)
      assert(out.filter(_.getAs[String]("source") == src)
        .map(_.getAs[Long]("n")).sum == bySource(src))
  }

  /** The oracle-replay arithmetic for the aHash-over-generated-images
    * chain: gray i = min(codepoint at ⌊i·len/64⌋, 255), bit i (of the
    * LOW 48) set iff 64·vᵢ > Σv — the exact-integer reduction of the
    * real kernel's cell-mean-vs-grid-mean comparison on one-pixel
    * cells (see BinaryColumns.docPng).
    */
  private def ahash48(text: String): Long = {
    val len = text.length
    val v = Array.tabulate(64)(i =>
      math.min(text.charAt(((i.toLong * len) / 64).toInt).toInt, 255))
    val s = v.map(_.toLong).sum
    var bits = 0L
    for (i <- 0 until 48) if (64L * v(i) > s) bits |= 1L << i
    bits
  }

  test("mm_phash_buckets matches local banding; pairs share 12 bits") {
    val out = multimodal.BinaryColumns.phashBuckets(spark, sf)
      .collect().map(r => r.getAs[Long]("band") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect()
      .filter(_.getAs[String]("text").nonEmpty)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    // oracle-replayability pin: the arithmetic formula IS the real
    // chain (PNG encode → ImageIO decode → averageHash64, low 48)
    for ((_, text) <- docs.take(20))
      assert((multimodal.BinaryColumns.FakeDecoder.averageHash64(
        multimodal.BinaryColumns.docPng(text)) & ((1L << 48) - 1))
        == ahash48(text))
    for (band <- 1 to 4) {
      val keyed = docs.map { case (id, text) =>
        val h48 = ahash48(text)
        (((h48 >> ((band - 1) * 12)) & 4095L), (id, h48))
      }
      val buckets = keyed.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val ks = buckets.values.map(_.length.toLong)
      val pairs = buckets.values.flatMap { members =>
        val s = members.sortBy(_._1)
        for (i <- s.indices; j <- (i + 1) until s.length)
          yield java.lang.Long.bitCount(s(i)._2 ^ s(j)._2).toLong
      }.toSeq
      val r = out(band.toLong)
      assert(r.getAs[Long]("n_buckets") == buckets.size.toLong)
      assert(r.getAs[Long]("n_multi") == ks.count(_ >= 2).toLong)
      assert(r.getAs[Long]("cand_pairs") ==
        ks.map(k => k * (k - 1) / 2).sum)
      assert(r.getAs[Long]("max_bucket") == ks.max)
      if (pairs.nonEmpty) {
        assert(r.getAs[Double]("avg_hamming") ==
          round6(pairs.sum.toDouble / pairs.length))
        // members of a bucket share that band's 12 bits of the 48
        assert(pairs.max <= 36L)
      } else assert(r.isNullAt(r.fieldIndex("avg_hamming")))
    }
  }
}
