package graft

import org.apache.spark.sql.functions._

/** Round-8 batch 7: retrieval ranking eval, link prediction, grouped
  * weighted quantiles / OLS, inter-arrival burstiness. Each test pins
  * the operator against an independent local recomputation (the
  * oracle gate checks DuckDB parity; these pin the SEMANTICS).
  */
class R8Batch7Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("events_burstiness matches a local gap-moment recompute") {
    val out = operators.Events.eventsBurstiness(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts_s", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_s"),
        r.getAs[Long]("event_id")))
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      val n = gaps.length.toLong
      val sg = gaps.sum
      if (n >= 2 && sg > 0) {
        val sg2 = gaps.map(g => g * g).sum
        val mu = sg.toDouble / n
        val sigma = math.sqrt((n * sg2 - sg * sg).toDouble) / n
        Some(u -> (n, round6(mu), round6(sigma), round6(sigma / mu),
          round6((sigma - mu) / (sigma + mu))))
      } else None
    }
    assert(out.keySet == expected.keySet)
    for ((u, (n, mu, sd, cv, b)) <- expected) {
      val r = out(u)
      assert(r.getAs[Long]("n_gaps") == n)
      assert(r.getAs[Double]("mean_gap_s") == mu)
      assert(r.getAs[Double]("sd_gap_s") == sd)
      assert(r.getAs[Double]("cv") == cv, s"user $u")
      val bi = r.getAs[Double]("burstiness")
      assert(bi == b && bi >= -1.0 && bi <= 1.0)
    }
  }

  test("part_price_ols matches a local normal-equations recompute") {
    val out = operators.Olap.partPriceOls(spark, sf).collect()
      .map(r => r.getAs[String]("p_brand") -> r).toMap
    val xy = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        round(col("l_discount") * 100).cast("long").as("x"),
        round(col("l_quantity")).cast("long").as("y"))
      .collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("x"), r.getAs[Long]("y")))
    val expected = xy.groupBy(_._1).map { case (brand, rows) =>
      val n = rows.length.toLong
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val syy = rows.map(r => r._3 * r._3).sum
      val covN = n * sxy - sx * sy
      val varxN = n * sxx - sx * sx
      val varyN = n * syy - sy * sy
      brand -> (n, round6(covN.toDouble / varxN),
        round6((sy.toDouble - covN.toDouble / varxN * sx) / n),
        round6(covN.toDouble * covN / (varxN.toDouble * varyN)))
    }
    assert(out.keySet == expected.keySet)
    for ((brand, (n, slope, icept, r2)) <- expected) {
      val r = out(brand)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("slope_qty_per_pct") == slope, s"brand $brand")
      assert(r.getAs[Double]("intercept_qty") == icept)
      val rr = r.getAs[Double]("r2")
      assert(rr == r2 && rr >= 0.0 && rr <= 1.0)
    }
  }

  test("part_weighted_median: 2·cum ≥ total picks the exact weighted median") {
    val out = operators.Olap.partWeightedMedian(spark, sf).collect()
      .map(r => r.getAs[String]("p_brand") -> r).toMap
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"),
        round(col("l_quantity")).cast("long").as("q"))
      .collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("pc"), r.getAs[Long]("q")))
    val expected = rows.groupBy(_._1).map { case (brand, rs) =>
      val grid = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val total = grid.map(_._2).sum
      var cum = 0L
      val med = grid.collectFirst {
        case (pc, w) if { cum += w; cum * 2 >= total } => pc
      }.get
      brand -> (total, grid.length.toLong, med / 100.0)
    }
    assert(out.keySet == expected.keySet)
    for ((brand, (total, npts, med)) <- expected) {
      val r = out(brand)
      assert(r.getAs[Long]("total_qty") == total)
      assert(r.getAs[Long]("n_price_points") == npts)
      assert(r.getAs[Double]("median_price") == med, s"brand $brand")
    }
  }

  test("graph_adamic_adar: non-adjacent two-hop scores, exact top-3") {
    val out = operators.Graph.graphAdamicAdar(spark, sf).collect()
    // local graph build
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("o"), r.getAs[Long]("p")))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    for ((_, parts) <- op.groupBy(_._1); Array(a, b) <- parts.map(_._2)
           .distinct.sorted.combinations(2)) {
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val qNodes = deg.toSeq.sortBy { case (n, d) => (-d, n) }.take(50).map(_._1)
    def w6(d: Long): Long = math.round(1e6 / math.log(d.toDouble))
    val expected = qNodes.flatMap { a =>
      val cands = adj(a).toSeq.flatMap(c => adj(c).filter(_ != a).map(_ -> c))
        .groupBy(_._1)
        .filter { case (b, _) => !adj(a).contains(b) }
        .map { case (b, wedges) =>
          val cn = wedges.length.toLong
          val aa = wedges.map { case (_, c) => w6(deg(c)) }.sum
          (b, cn, aa)
        }.toSeq
      cands.sortBy { case (b, _, aa) => (-aa, b) }.take(3).zipWithIndex.map {
        case ((b, cn, aa), i) =>
          (a, b) -> (cn, round6(cn.toDouble / (deg(a) + deg(b) - cn)),
            round6(aa / 1e6), i + 1)
      }
    }.toMap
    assert(out.length == expected.size)
    for (r <- out) {
      val key = (r.getAs[Long]("p_partkey"), r.getAs[Long]("candidate"))
      val (cn, jac, aa, rank) = expected(key)
      assert(r.getAs[Long]("n_common") == cn, s"$key")
      assert(r.getAs[Double]("jaccard") == jac)
      assert(r.getAs[Double]("adamic_adar") == aa)
      assert(r.getAs[Int]("rank") == rank)
      // predicted links are genuinely non-adjacent
      assert(!adj(key._1).contains(key._2))
    }
  }

  test("retrieval_ndcg: metrics recompute exactly from the retrieved top-3") {
    val out = operators.Matching.retrievalNdcg(spark, sf).collect()
      .map(r => r.getAs[Long]("i") -> r).toMap
    val meta = Tables.documents(spark, sf)
      .select("doc_id", "lang", "source").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[String]("source"))).toMap
    val top = operators.Matching.retrieveChunksBm25(spark, sf).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rank")))
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    val expected = top.groupBy(_._1).map { case (i, rows) =>
      val judged = rows.sortBy(_._3).map { case (_, d, rank) =>
        val rel = (if (meta(d)._1 == meta(i)._1) 1L else 0L) +
          (if (meta(d)._2 == meta(i)._2) 1L else 0L)
        (rank, rel, if (rel == 2) 3L else if (rel == 1) 1L else 0L)
      }
      val nRel = judged.count(_._2 >= 1).toLong
      val mrr = judged.filter(_._2 >= 1).map(j => 1.0 / j._1)
        .maxOption.getOrElse(0.0)
      val dcg = judged.map(j => j._3 / log2(j._1 + 1.0)).sum
      val ideal = judged.sortBy(j => (-j._3, j._1)).zipWithIndex
      val idcg = ideal.map { case (j, k) => j._3 / log2(k + 2.0) }.sum
      i -> (nRel, round6(nRel / 3.0), round6(mrr), round6(dcg),
        round6(if (idcg > 0) dcg / idcg else 0.0))
    }
    assert(out.keySet == expected.keySet && out.nonEmpty)
    for ((i, (nRel, prec, mrr, dcg, ndcg)) <- expected) {
      val r = out(i)
      assert(r.getAs[Long]("n_rel") == nRel, s"query $i")
      assert(r.getAs[Double]("prec_at3") == prec)
      assert(r.getAs[Double]("mrr") == mrr)
      assert(r.getAs[Double]("dcg_at3") == dcg)
      val n = r.getAs[Double]("ndcg_at3")
      assert(n == ndcg && n >= 0.0 && n <= 1.0)
    }
  }
}
