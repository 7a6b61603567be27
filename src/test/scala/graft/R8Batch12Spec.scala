package graft

/** Round-8 batch 12: RAKE keyphrases, pg_trgm trigram matching,
  * length-curriculum staging, kNN label-coherence eval. Local
  * recompute pins at sf0.001.
  */
class R8Batch12Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val stops = Set("the", "a", "and", "or", "of")

  /** reference RAKE: stop-delimited runs chunked to ≤3 tokens. */
  private def localPhrases(): Seq[Seq[String]] = {
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    docs.toSeq.flatMap { text =>
      val t = text.split("\\s+").toSeq
      // maximal non-stop runs
      val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      for (w <- t) {
        if (stops(w)) { if (cur.nonEmpty) { runs += cur.toSeq; cur.clear() } }
        else cur += w
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs.flatMap(_.grouped(3))
    }
  }

  test("text_keyphrase_rake matches a local RAKE recompute") {
    val out = operators.TextAnalysis.textKeyphraseRake(spark, sf).collect()
    assert(out.length == 20)
    val phrases = localPhrases()
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val degree = phrases.flatMap(p => p.map(w => w -> p.size.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    val scored = phrases.map(_.mkString(" ")).groupBy(identity).map {
      case (ph, occ) =>
        val ws = ph.split(" ").toSeq
        val s = ws.map(w =>
          math.round(1e6 * degree(w) / freq(w))).sum
        (ph, occ.size.toLong, s)
    }.toSeq
    val top = scored.sortBy { case (ph, _, s) => (-s, ph) }.take(20)
    for (((ph, nOcc, s), i) <- top.zipWithIndex) {
      val r = out(i)
      assert(r.getAs[String]("phrase") == ph, s"rank ${i + 1}")
      assert(r.getAs[Long]("n_occ") == nOcc, ph)
      assert(r.getAs[Double]("rake_score") == round6(s / 1e6), ph)
      assert(r.getAs[Int]("rank") == i + 1)
    }
    // RAKE actually favors multi-word phrases on this corpus
    assert(out.take(5).exists(_.getAs[String]("phrase").contains(" ")))
  }

  private def trigrams(name: String): Set[String] = {
    val nm = name.toLowerCase.trim
    nm.split(" ").toSeq.flatMap { w =>
      val padded = "  " + w + " "
      (0 to w.length).map(i => padded.substring(i, i + 3))
    }.toSet
  }

  test("match_trigram matches a local pg_trgm-style recompute") {
    val out = operators.Matching.matchTrigram(spark, sf).collect()
      .map(r => r.getAs[Long]("l_key") -> r).toMap
    val parts = Tables.part(spark, sf).select("p_partkey", "p_name").collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[String]("p_name")))
    val tg = parts.map { case (k, n) => k -> trigrams(n) }.toMap
    val dfc = parts.flatMap { case (k, _) => tg(k) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rare2 = parts.map { case (k, _) =>
      k -> tg(k).toSeq.sortBy(t => (dfc(t), t)).take(2).toSet
    }.toMap
    val names = parts.toMap
    val lefts = parts.filter(_._1 % 2 == 0).map(_._1)
    val rights = parts.filter(_._1 % 2 == 1).map(_._1)
    var matched = 0
    for (l <- lefts) {
      val cands = rights.filter(r => rare2(l).intersect(rare2(r)).nonEmpty)
      val scored = cands.map { r =>
        val shared = tg(l).intersect(tg(r)).size.toLong
        val sim = round6(shared.toDouble /
          (tg(l).size + tg(r).size - shared))
        (r, shared, sim)
      }.filter(_._3 >= 0.45)
      if (scored.nonEmpty) {
        val (rk, shared, sim) = scored.minBy { case (r, _, s) => (-s, r) }
        val row = out(l)
        assert(row.getAs[Long]("r_key") == rk, s"left $l")
        assert(row.getAs[String]("r_name") == names(rk))
        assert(row.getAs[Long]("shared") == shared)
        assert(row.getAs[Double]("sim") == sim)
        matched += 1
      } else assert(!out.contains(l), s"left $l should have no match")
    }
    assert(matched == out.size && matched > 0)
    // identical names match at sim 1.0 through the rarest-2 blocking
    assert(out.values.exists(_.getAs[Double]("sim") == 1.0))
  }

  test("sample_curriculum assigns grid-exact per-source quartile stages") {
    val out = operators.Sampling.sampleCurriculum(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text")))
    assert(out.size == docs.length)
    val withLen = docs.map { case (id, src, text) =>
      (id, src, text.split("\\s+").length.toLong)
    }
    val bySrc = withLen.groupBy(_._2)
    for ((id, src, n) <- withLen) {
      val ns = bySrc(src).map(_._3)
      val cumBefore = ns.count(_ < n).toLong
      val stage = math.min(4L, 1L + 4L * cumBefore / ns.length)
      val r = out(id)
      assert(r.getAs[Long]("n_words") == n, s"doc $id")
      assert(r.getAs[Long]("stage") == stage, s"doc $id")
    }
    // all four stages are populated and ordered by length within source
    for ((src, rows) <- bySrc) {
      val stages = rows.map(t => out(t._1).getAs[Long]("stage"))
      assert(stages.toSet == Set(1L, 2L, 3L, 4L), src)
      val pairs = rows.map(t => (t._3, out(t._1).getAs[Long]("stage")))
        .sortBy(_._1)
      assert(pairs.map(_._2).toSeq == pairs.map(_._2).sorted.toSeq, src)
    }
  }

  test("embed_knn_classifier agrees with knn_graph_mutual's edge counts") {
    val cm = operators.Similarity.embedKnnClassifier(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    // every vector votes exactly once → confusion mass = corpus size
    assert(cm.map(_.getAs[Long]("n")).sum == n)
    // per-label accuracy is consistent with the matrix itself
    val byTrue = cm.groupBy(_.getAs[Int]("true_label"))
    for ((t, rows) <- byTrue) {
      val tot = rows.map(_.getAs[Long]("n")).sum
      val correct = rows.filter(r =>
        r.getAs[Int]("pred_label") == t).map(_.getAs[Long]("n")).sum
      val acc = round6(correct.toDouble / tot)
      for (r <- rows)
        assert(r.getAs[Double]("label_accuracy") == acc, s"label $t")
    }
    // above-chance label coherence (the synthetic labels are weak
    // clusters — sf0.001 measures ~1.7x chance, not a tight grouping)
    val diag = cm.filter(r =>
      r.getAs[Int]("true_label") == r.getAs[Int]("pred_label"))
      .map(_.getAs[Long]("n")).sum
    val nLabels = byTrue.size
    assert(diag.toDouble / n > 1.2 / nLabels,
      s"diag=$diag n=$n labels=$nLabels")
  }
}
