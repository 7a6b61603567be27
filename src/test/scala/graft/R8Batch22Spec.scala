package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.{col, expr, quarter, year}

/** Round-8 batch 22: DAU/MAU stickiness, unit-price integrity,
  * priority mix-shift PSI, split-policy leakage audit. Local
  * recompute pins at sf0.001.
  */
class R8Batch22Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniform(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) / math.pow(16, 8)

  test("events_stickiness: MAU28 equals the brute-force sliding distinct") {
    val out = operators.Events.eventsStickiness(spark, sf).collect()
    val pres = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_s div 86400").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
    val days = pres.map(_._2).distinct.sorted
    assert(out.map(_.getAs[Long]("day")).toSeq == days.toSeq)
    for (r <- out) {
      val d = r.getAs[Long]("day")
      val dau = pres.count(_._2 == d).toLong
      // brute force: distinct users with ANY presence in [d-27, d]
      val mau = pres.filter(p => p._2 >= d - 27 && p._2 <= d)
        .map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") == dau, s"day $d dau")
      assert(r.getAs[Long]("mau28") == mau, s"day $d mau")
      assert(r.getAs[Double]("stickiness") == round6(dau.toDouble / mau))
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("mau28"))
    }
  }

  test("part_price_dispersion matches a local moments recompute") {
    val out = operators.Olap.partPriceDispersion(spark, sf).collect()
    assert(out.length <= 20)
    val rows = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getAs[Long]("l_partkey"),
        math.round(r.getAs[Double]("l_extendedprice")
          / r.getAs[Double]("l_quantity") * 100)))
    val stats = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      .filter(_._2.length >= 2)
      .map { case (pk, us) =>
        val n = us.length
        val mean = us.sum.toDouble / n
        val varr = math.max(
          us.map(u => u.toDouble * u).sum / n - mean * mean, 0.0)
        (pk, n.toLong, mean, us.min, us.max,
          round6(math.sqrt(varr) / mean))
      }
    val expected = stats.sortBy { case (pk, _, _, _, _, cv) => (-cv, pk) }
      .take(20)
    for ((r, (pk, n, mean, mn, mx, cv)) <- out.zip(expected)) {
      assert(r.getAs[Long]("l_partkey") == pk)
      assert(r.getAs[Long]("n_lines") == n)
      assert(r.getAs[Double]("mean_unit_price") == round6(mean / 100.0))
      assert(r.getAs[Double]("min_unit_price") ==
        BigDecimal(mn.toDouble / 100.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Double]("cv") == cv)
      assert(r.getAs[Double]("cv") >= 0.0)
    }
  }

  test("orders_priority_psi: shares and PSI reconcile locally") {
    val out = operators.Olap.ordersPriorityPsi(spark, sf).collect()
    val cells = Tables.orders(spark, sf)
      .select(((year(col("o_orderdate")) - 1992) * 4
        + quarter(col("o_orderdate")) - 1).cast("long").as("q"),
        col("o_orderpriority").as("p"))
      .collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[String]("p")))
    val byCell = cells.groupBy(identity).view.mapValues(_.length.toLong)
    val byQ = cells.groupBy(_._1).view.mapValues(_.length.toLong)
    val byP = cells.groupBy(_._2).view.mapValues(_.length.toLong)
    val total = cells.length.toLong
    assert(out.length == byCell.size)
    val psiByQ = collection.mutable.Map.empty[Long, Double]
    for (r <- out) {
      val (q, p) = (r.getAs[Long]("quarter"), r.getAs[String]("priority"))
      val n = byCell((q, p))
      assert(r.getAs[Long]("n") == n)
      val sq = (n + 0.5) / (byQ(q) + 2.5)
      val sb = (byP(p) + 0.5) / (total + 2.5)
      assert(r.getAs[Double]("share_quarter") == round6(sq))
      assert(r.getAs[Double]("share_baseline") == round6(sb))
      val term = (sq - sb) * math.log(sq / sb)
      assert(r.getAs[Double]("psi_term") == round6(term))
      psiByQ(q) = psiByQ.getOrElse(q, 0.0) + term
      // PSI terms are non-negative by construction
      assert(r.getAs[Double]("psi_term") >= 0.0)
    }
    for (r <- out) {
      // psi_quarter is round(Σterms, 6) — half-ulp tolerance
      assert(math.abs(r.getAs[Double]("psi_quarter")
        - psiByQ(r.getAs[Long]("quarter"))) < 5.1e-7)
    }
  }

  test("sample_split_leakage: content-keyed policy leaks exactly zero") {
    val out = operators.Sampling.sampleSplitLeakage(spark, sf).collect()
      .map(r => r.getAs[String]("policy") -> r).toMap
    assert(out.keySet == Set("id_keyed", "content_keyed"))
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    def splitOf(u: Double) =
      if (u < 0.8) "train" else if (u < 0.9) "val" else "test"
    val members = docs.map { case (id, t) =>
      (md5hex(t), id, splitOf(uniform(t)), splitOf(uniform(s"$id#split")))
    }
    val fams = members.groupBy(_._1).values.filter(_.length >= 2).toSeq
    val pairs = fams.flatMap { f =>
      val s = f.sortBy(_._2)
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }
    val crossId = pairs.count { case (a, b) => a._4 != b._4 }.toLong
    val crossContent = pairs.count { case (a, b) => a._3 != b._3 }.toLong
    assert(crossContent == 0L,
      "identical text must hash-split identically")
    for ((policy, cross) <- Seq("id_keyed" -> crossId,
      "content_keyed" -> crossContent)) {
      val r = out(policy)
      assert(r.getAs[Long]("n_dup_pairs") == pairs.length.toLong)
      assert(r.getAs[Long]("n_cross_split") == cross, policy)
      val share = if (pairs.nonEmpty) cross.toDouble / pairs.length else 0.0
      assert(r.getAs[Double]("leak_share") == round6(share))
    }
  }
}
