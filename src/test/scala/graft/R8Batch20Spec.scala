package graft

import org.apache.spark.sql.functions.{col, expr}

/** Round-8 batch 20: local clustering coefficients, weekly growth
  * accounting, ABC inventory classification, ABN mod-89 checksum
  * audit. Local recompute pins at sf0.001.
  */
class R8Batch20Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("graph_clustering_local matches a local triangle recompute") {
    val out = operators.Graph.graphClusteringLocal(spark, sf).collect()
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("o"), r.getAs[Long]("p")))
    val byOrder = op.groupBy(_._1).values.map(_.map(_._2).sorted)
    val edges = byOrder.flatMap { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val nbrs = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val coeffs = nbrs.toSeq.collect { case (v, ns) if ns.size >= 2 =>
      val nsArr = ns.toArray
      var tri = 0L
      for (i <- nsArr.indices; j <- (i + 1) until nsArr.length)
        if (edges.contains((math.min(nsArr(i), nsArr(j)),
          math.max(nsArr(i), nsArr(j))))) tri += 1
      2.0 * tri / (ns.size.toDouble * (ns.size - 1).toDouble)
    }
    val byBucket = coeffs.groupBy(c => math.min(10L, math.floor(c * 10).toLong))
    assert(out.length == byBucket.size)
    for (r <- out) {
      val b = r.getAs[Long]("bucket")
      val cs = byBucket(b)
      assert(r.getAs[Long]("n_nodes") == cs.length.toLong)
      assert(r.getAs[Double]("share") ==
        round6(cs.length.toDouble / coeffs.length))
      val sU6 = cs.map(c => math.round(c * 1e6)).sum
      assert(r.getAs[Double]("avg_coeff") ==
        round6(sU6.toDouble / cs.length / 1e6))
    }
  }

  test("events_growth_accounting: states reconcile week over week") {
    val out = operators.Events.eventsGrowthAccounting(spark, sf).collect()
      .map(r => r.getAs[Long]("week") -> r).toMap
    val pr = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_s div 604800").as("week"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("week")))
    val byUser = pr.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val weeks = pr.map(_._2).distinct.sorted
    assert(out.keySet == weeks.toSet)
    for (w <- weeks) {
      var nNew, nRet, nRes = 0L
      byUser.values.foreach { ws =>
        val i = ws.indexOf(w)
        if (i == 0) nNew += 1
        else if (i > 0 && ws(i - 1) == w - 1) nRet += 1
        else if (i > 0) nRes += 1
      }
      val active = byUser.values.count(_.contains(w)).toLong
      val prevActive = byUser.values.count(_.contains(w - 1)).toLong
      val r = out(w)
      assert(r.getAs[Long]("n_new") == nNew, s"week $w new")
      assert(r.getAs[Long]("n_retained") == nRet, s"week $w retained")
      assert(r.getAs[Long]("n_resurrected") == nRes, s"week $w resurrected")
      assert(r.getAs[Long]("n_active") == active, s"week $w active")
      // churned(w) = active(w-1) − retained(w); first week churns 0
      val churn = if (weeks.contains(w - 1)) prevActive - nRet else 0L
      assert(r.getAs[Long]("n_churned") == churn, s"week $w churned")
    }
  }

  test("part_abc_class matches a local exact-cents recompute") {
    val out = operators.Olap.partAbcClass(spark, sf).collect()
      .map(r => r.getAs[String]("abc_class") -> r).toMap
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getAs[Long]("l_partkey"),
        math.round(r.getAs[Double]("l_extendedprice")
          * (1.0 - r.getAs[Double]("l_discount")) * 100)))
    val rev = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (k, v) => (-v, k) }
    val total = rev.map(_._2).sum
    var cum = 0L
    val classes = rev.map { case (_, v) =>
      val cls = if (cum * 5 < total * 4) "A"
      else if (cum * 20 < total * 19) "B" else "C"
      cum += v
      (cls, v)
    }
    val byCls = classes.groupBy(_._1)
    assert(out.keySet == byCls.keySet)
    for ((cls, vs) <- byCls) {
      val r = out(cls)
      assert(r.getAs[Long]("n_parts") == vs.length.toLong)
      assert(r.getAs[Double]("revenue") ==
        BigDecimal(vs.map(_._2).sum.toDouble / 100.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Double]("revenue_share") ==
        round6(vs.map(_._2).sum.toDouble / total))
      assert(r.getAs[Double]("part_share") ==
        round6(vs.length.toDouble / rev.length))
    }
    // A carries more revenue per part than B, B more than C
    val perPart = byCls.view.mapValues(v =>
      v.map(_._2).sum.toDouble / v.length).toMap
    for (Seq(hi, lo) <- Seq("A", "B", "C").filter(perPart.contains)
        .sliding(2).filter(_.length == 2))
      assert(perPart(hi) > perPart(lo))
  }

  test("clean_abn_checksum matches a local mod-89 recompute") {
    val out = operators.Cleaning.cleanAbnChecksum(spark, sf).collect()
    val weights = Array(10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19)
    val abns = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getAs[Long]("c_custkey"))
      .map(k => if (k % 7 == 0) f"$k%010d" else f"$k%011d")
    val flagged = abns.map { abn =>
      val valid = abn.length == 11 && {
        val s = abn.zipWithIndex.map { case (c, i) =>
          ((c - '0') - (if (i == 0) 1 else 0)) * weights(i)
        }.sum
        s % 89 == 0
      }
      (abn.length.toLong, if (valid) 1 else 0)
    }
    val byCell = flagged.groupBy(identity).view.mapValues(_.length.toLong)
    assert(out.length == byCell.size)
    for (r <- out) {
      val cell = (r.getAs[Long]("abn_len"), r.getAs[Int]("checksum_valid"))
      assert(r.getAs[Long]("n") == byCell(cell), s"cell $cell")
      assert(r.getAs[Double]("share") ==
        round6(byCell(cell).toDouble / abns.length))
    }
    // 10-digit ABNs can never be checksum-valid
    assert(!out.exists(r => r.getAs[Long]("abn_len") == 10L &&
      r.getAs[Int]("checksum_valid") == 1))
  }
}
