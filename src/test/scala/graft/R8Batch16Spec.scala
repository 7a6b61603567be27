package graft

import java.security.MessageDigest

/** Round-8 batch 16: distributional A/B (QTE), Benford first-digit
  * screen, lexical diversity, hub 2-hop expansion. Local recompute
  * pins at sf0.001.
  */
class R8Batch16Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniform(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) / math.pow(16, 8)

  test("events_qte matches a local exact-quantile recompute") {
    val out = operators.Events.eventsQte(spark, sf).collect()
      .map(r => r.getAs[Long]("q_pct") -> r).toMap
    assert(out.keySet == Set(25L, 50L, 75L, 90L))
    val ev = Tables.events(spark, sf)
      .filter("event_type = 'purchase'")
      .select("user_id", "value").collect()
      .map(r => (if (uniform(r.getAs[Long]("user_id").toString) < 0.5) "A"
                 else "B",
        math.round(r.getAs[Double]("value") * 100)))
    def quantile(variant: String, qPct: Long): Long = {
      val vs = ev.filter(_._1 == variant).map(_._2).sorted
      // smallest value whose ECDF count covers q% of the total
      vs.zipWithIndex.collectFirst {
        case (v, i) if (i + 1) * 100L >= qPct * vs.length => v
      }.get
    }
    for (q <- Seq(25L, 50L, 75L, 90L)) {
      val r = out(q)
      assert(r.getAs[Double]("q_a") == quantile("A", q) / 100.0, s"q$q A")
      assert(r.getAs[Double]("q_b") == quantile("B", q) / 100.0, s"q$q B")
      assert(r.getAs[Double]("qte") ==
        (quantile("B", q) - quantile("A", q)) / 100.0, s"q$q te")
    }
    // quantiles are monotone in q within each variant
    val sortedQ = Seq(25L, 50L, 75L, 90L).map(out)
    assert(sortedQ.map(_.getAs[Double]("q_a")) ==
      sortedQ.map(_.getAs[Double]("q_a")).sorted)
    assert(sortedQ.map(_.getAs[Double]("q_b")) ==
      sortedQ.map(_.getAs[Double]("q_b")).sorted)
  }

  test("events_benford matches a local digit recompute") {
    val out = operators.Events.eventsBenford(spark, sf).collect()
    assert(out.map(_.getAs[Long]("d")).toSeq == (1L to 9L))
    val digits = Tables.events(spark, sf)
      .filter("event_type = 'purchase' AND value > 0")
      .select("value").collect()
      .map(r => math.round(r.getAs[Double]("value") * 100)
        .toString.substring(0, 1).toLong)
    val counts = digits.groupBy(identity).view.mapValues(_.length.toLong)
    val n = digits.length.toLong
    var shareSum = 0.0
    for (r <- out) {
      val d = r.getAs[Long]("d")
      val nObs = counts.getOrElse(d, 0L)
      assert(r.getAs[Long]("n_obs") == nObs, s"digit $d")
      assert(r.getAs[Double]("obs_share") == round6(nObs.toDouble / n))
      val expShare = round6(math.log10(1.0 + 1.0 / d))
      assert(r.getAs[Double]("exp_share") == expShare)
      val expN = expShare * n
      assert(r.getAs[Double]("chi2_term") ==
        round6((nObs - expN) * (nObs - expN) / expN), s"digit $d chi2")
      shareSum += r.getAs[Double]("obs_share")
    }
    assert(math.abs(shareSum - 1.0) < 1e-4)
  }

  test("text_lexical_diversity matches a per-doc frequency recompute") {
    val out = operators.TextAnalysis.textLexicalDiversity(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    assert(out.size == docs.length)
    for ((id, text) <- docs) {
      val freq = text.split("\\s+").groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      val n = freq.values.sum
      val types = freq.size.toLong
      val hapax = freq.values.count(_ == 1L).toLong
      val sumC2 = freq.values.map(c => c * c).sum
      val r = out(id)
      assert(r.getAs[Long]("n_tokens") == n, s"doc $id")
      assert(r.getAs[Long]("n_types") == types, s"doc $id")
      assert(r.getAs[Long]("n_hapax") == hapax, s"doc $id")
      assert(r.getAs[Double]("ttr") == round6(types.toDouble / n))
      assert(r.getAs[Double]("hapax_share") ==
        round6(hapax.toDouble / types))
      assert(r.getAs[Double]("yule_k") ==
        round6(1e4 * (sumC2 - n).toDouble / (n.toDouble * n.toDouble)))
    }
  }

  test("graph_2hop_reach matches a local BFS recompute") {
    val out = operators.Graph.graphTwoHopReach(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 50)
    // co-order adjacency from first principles
    val op = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    val adj = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
    for ((_, parts) <- byOrder; a <- parts; b <- parts if a != b)
      adj.getOrElseUpdate(a, collection.mutable.Set.empty) += b
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val top = deg.toSeq.sortBy { case (n, d) => (-d, n) }.take(50)
    assert(out.map(_.getAs[Long]("p_partkey")).toSet ==
      top.map(_._1).toSet)
    val byNode = out.map(r => r.getAs[Long]("p_partkey") -> r).toMap
    for ((node, dg) <- top) {
      val reach = (adj(node).flatMap(c => adj(c) + c) - node).size.toLong
      val r = byNode(node)
      assert(r.getAs[Long]("deg_a") == dg, s"node $node deg")
      assert(r.getAs[Long]("reach_2") == reach, s"node $node reach")
      assert(r.getAs[Double]("expansion") ==
        round6(reach.toDouble / dg), s"node $node exp")
      assert(reach >= dg) // 2-hop set contains all direct neighbors
    }
    // output ordered by reach desc, node asc
    val order = out.map(r =>
      (-r.getAs[Long]("reach_2"), r.getAs[Long]("p_partkey"))).toSeq
    assert(order == order.sorted)
  }
}
