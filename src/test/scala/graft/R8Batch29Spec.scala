package graft

import org.apache.spark.sql.functions.{col, expr}

/** Round-8 batch 29: rich-club curve, bigram entropy, top movers,
  * langid confidence margins. Local recompute pins at sf0.001.
  */
class R8Batch29Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  private def coEdges(): Set[(Long, Long)] = {
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect()
      .map(x => (x.getAs[Long]("o"), x.getAs[Long]("p")))
    op.groupBy(_._1).values.flatMap { ps =>
      val s = ps.map(_._2).distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.toSet
  }

  test("graph_rich_club matches a local induced-density recompute") {
    val out = operators.Graph.graphRichClub(spark, sf).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(out.keySet == Set(0L, 8L, 16L, 24L))
    val edges = coEdges()
    val deg = edges.toSeq.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(0L, 8L, 16L, 24L)) {
      val club = deg.filter(_._2 > k).keySet
      val ce = edges.count { case (u, v) => club(u) && club(v) }.toLong
      val r = out(k)
      assert(r.getAs[Long]("n_club") == club.size.toLong, s"k=$k club")
      assert(r.getAs[Long]("n_edges") == ce, s"k=$k edges")
      val phi = if (club.size >= 2)
        ce.toDouble * 2 / (club.size.toDouble * (club.size - 1)) else 0.0
      assert(r.getAs[Double]("phi") == round6(phi))
    }
    // clubs shrink as k rises
    val sizes = Seq(0L, 8L, 16L, 24L).map(out(_).getAs[Long]("n_club"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
  }

  test("text_bigram_entropy matches a local conditional-entropy recompute") {
    val out = operators.TextAnalysis.textBigramEntropy(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("source", "text")
      .collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[String]("text").split("\\s+").toSeq))
      .filter(_._2.length >= 2)
    val bySrc = docs.groupBy(_._1)
    assert(out.length == bySrc.size)
    for (r <- out) {
      val src = r.getAs[String]("source")
      val bis = bySrc(src).flatMap(d => d._2.zip(d._2.tail))
      val c12 = bis.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = bis.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n = bis.length.toLong
      assert(r.getAs[Long]("n_bigrams") == n)
      val hcU9 = c12.map { case ((w1, _), c) =>
        math.round(-(c.toDouble / n) * log2(c.toDouble / c1(w1)) * 1e9)
      }.sum
      val huU9 = c1.values.map { c =>
        math.round(-(c.toDouble / n) * log2(c.toDouble / n) * 1e9)
      }.sum
      assert(r.getAs[Double]("h_cond_bits") == round6(hcU9 / 1e9))
      assert(r.getAs[Double]("h_uni_bits") == round6(huU9 / 1e9))
      assert(r.getAs[Double]("predictability") ==
        round6(1.0 - hcU9.toDouble / huU9))
      // conditioning can only reduce entropy
      assert(r.getAs[Double]("h_cond_bits") <=
        r.getAs[Double]("h_uni_bits") + 1e-6)
    }
  }

  test("events_top_movers matches a local day-over-day recompute") {
    val out = operators.Events.eventsTopMovers(spark, sf).collect()
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("ts_s div 86400").as("day"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
      .map(r => ((r.getAs[String]("event_type"), r.getAs[Long]("day")),
        r.getAs[Long]("n"))).toMap
    val movers = daily.toSeq.flatMap { case ((t, d), n) =>
      daily.get((t, d - 1)).map { p =>
        (t, d, p, n, round6(math.log((n + 1.0) / (p + 1.0))))
      }
    }
    val expected = movers
      .sortBy { case (t, d, _, _, lr) => (-math.abs(lr), t, d) }
      .take(20)
    assert(out.length == expected.length)
    for ((r, (t, d, p, n, lr)) <- out.zip(expected)) {
      assert(r.getAs[String]("event_type") == t)
      assert(r.getAs[Long]("day") == d)
      assert(r.getAs[Long]("prev_n") == p)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("log_ratio") == lr)
      assert(r.getAs[Double]("pct_change") ==
        round6((n - p).toDouble / p))
    }
  }

  test("text_langid_margin reconciles with the langid prediction") {
    val out = operators.TextAnalysis.textLangidMargin(spark, sf).collect()
    val markers = operators.TextAnalysis.markers
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect()
      .map(r => r.getAs[String]("text").split("\\s+").toSeq)
    val scored = docs.map { toks =>
      val scores = toks.flatMap(t => markers.getOrElse(t, Nil))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (l, s) => (-s, l) }
      if (scores.isEmpty) ("und", 0L)
      else {
        val s1 = scores.head._2
        val s2 = if (scores.length > 1) scores(1)._2 else 0L
        (scores.head._1, s1 - s2)
      }
    }
    val byLang = scored.groupBy(_._1)
    assert(out.length == byLang.size)
    for (r <- out) {
      val lang = r.getAs[String]("pred_lang")
      val rows = byLang(lang)
      assert(r.getAs[Long]("n_docs") == rows.length.toLong, lang)
      assert(r.getAs[Double]("avg_margin") ==
        round6(rows.map(_._2).sum.toDouble / rows.length))
      assert(r.getAs[Long]("n_low_margin") ==
        rows.count(_._2 <= 1).toLong)
      assert(r.getAs[Double]("low_margin_share") ==
        round6(rows.count(_._2 <= 1).toDouble / rows.length))
    }
  }
}
