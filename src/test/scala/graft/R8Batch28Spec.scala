package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.{col, expr, year}

/** Round-8 batch 28: IVF list balance, perplexity-filter sweep,
  * sampled triangle estimator, spend-band migration. Local recompute
  * pins at sf0.001.
  */
class R8Batch28Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniform(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) / math.pow(16, 8)

  test("knn_ivf_balance matches a local centroid recompute") {
    val out = operators.Similarity.knnIvfBalance(spark, sf).collect()
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect()
      .map(r => (r.getAs[Int]("label"),
        r.getAs[Seq[Double]]("v").toArray))
    val byLabel = vecs.groupBy(_._1)
    val cents = byLabel.view.mapValues { vs =>
      val dim = vs.head._2.length
      Array.tabulate(dim)(i => vs.map(_._2(i)).sum / vs.length)
    }.toMap
    assert(out.length == byLabel.size)
    val total = vecs.length
    for (r <- out) {
      val lbl = r.getAs[Int]("label")
      val members = byLabel(lbl)
      assert(r.getAs[Long]("n_vecs") == members.length.toLong)
      assert(r.getAs[Double]("share") ==
        round6(members.length.toDouble / total))
      assert(r.getAs[Double]("imbalance") ==
        round6(members.length.toDouble * byLabel.size / total))
      val c = cents(lbl)
      val cn = math.sqrt(c.map(x => x * x).sum)
      val sU6 = members.map { case (_, v) =>
        val d = v.zip(c).map(p => p._1 * p._2).sum
        val vn = math.sqrt(v.map(x => x * x).sum)
        math.round(round6(d / (vn * cn)) * 1e6)
      }.sum
      assert(r.getAs[Double]("avg_centroid_cos") ==
        round6(sU6.toDouble / members.length / 1e6))
      // members sit closer to their own centroid than orthogonal
      assert(r.getAs[Double]("avg_centroid_cos") > 0.0)
    }
  }

  test("text_ppl_filter_sweep reconciles with per-doc perplexities") {
    val out = operators.TextAnalysis.textPplFilterSweep(spark, sf)
      .collect().sortBy(_.getAs[Long]("threshold"))
    val scored = operators.TextAnalysis.textPerplexity(spark, sf)
      .select("doc_id", "n_tokens", "ppl").collect()
      .map(r => (r.getAs[Long]("n_tokens"), r.getAs[Double]("ppl")))
    for (r <- out) {
      val t = r.getAs[Long]("threshold")
      val kept = scored.filter(_._2 <= t)
      assert(r.getAs[Long]("docs_kept") == kept.length.toLong, s"t=$t")
      assert(r.getAs[Long]("docs_total") == scored.length.toLong)
      assert(r.getAs[Long]("tokens_kept") == kept.map(_._1).sum)
      assert(r.getAs[Double]("doc_share") ==
        round6(kept.length.toDouble / scored.length))
    }
    // the sweep is monotone in the threshold
    val keptSeq = out.map(_.getAs[Long]("docs_kept"))
    assert(keptSeq.zip(keptSeq.tail).forall { case (a, b) => a <= b })
  }

  test("graph_triangle_estimate: sampled count matches brute force") {
    // registered query returns the sampled side alone; the audit
    // relation joins in the exact count (spec-only — the estimator's
    // whole point is that production never pays for exact)
    val est = operators.Graph.graphTriangleEstimate(spark, sf).collect()
    assert(est.length == 1)
    assert(est.head.schema.fieldNames.toSet ==
      Set("sampled_triangles", "p", "estimate"))
    val out = operators.Graph.graphTriangleEstimateAudit(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    assert(est.head.getAs[Long]("sampled_triangles") ==
      r.getAs[Long]("sampled_triangles"))
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect()
      .map(x => (x.getAs[Long]("o"), x.getAs[Long]("p")))
    val edges = op.groupBy(_._1).values.flatMap { ps =>
      val s = ps.map(_._2).distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.toSet
    def triangles(es: Set[(Long, Long)]): Long = {
      val nbrs = es.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      es.toSeq.map { case (u, v) =>
        (nbrs(u) intersect nbrs(v)).count(w => w > v).toLong
      }.sum
    }
    val exact = triangles(edges)
    val sampled = edges.filter { case (u, v) =>
      uniform(s"$u:$v#tri") < 0.5
    }
    val sTri = triangles(sampled)
    assert(r.getAs[Long]("exact_triangles") == exact)
    assert(r.getAs[Long]("sampled_triangles") == sTri)
    assert(r.getAs[Double]("estimate") == round6(sTri / 0.125))
    assert(r.getAs[Double]("rel_error") ==
      round6(math.abs(sTri / 0.125 - exact) / exact))
  }

  test("orders_band_migration: matrix rows partition consecutive pairs") {
    val out = operators.Olap.ordersBandMigration(spark, sf).collect()
    val cy = Tables.orders(spark, sf)
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long")
        .as("yr"), col("o_totalprice")).collect()
      .map(r => ((r.getAs[Long]("o_custkey"), r.getAs[Long]("yr")),
        math.round(r.getAs[Double]("o_totalprice") * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def bandOf(cents: Long): Long =
      math.min(4L, math.max(0L,
        math.floor(math.log10(cents.toDouble / 100.0)).toLong))
    val byCust = cy.keys.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    val pairs = byCust.toSeq.flatMap { case (ck, ys) =>
      ys.zip(ys.tail).collect { case (a, b) if b == a + 1 =>
        (bandOf(cy((ck, a))), bandOf(cy((ck, b))))
      }
    }
    val byCell = pairs.groupBy(identity).view.mapValues(_.size.toLong)
    val byFrom = pairs.groupBy(_._1).view.mapValues(_.size.toLong)
    assert(out.length == byCell.size)
    for (r <- out) {
      val cell = (r.getAs[Long]("band_from"), r.getAs[Long]("band_to"))
      assert(r.getAs[Long]("n_customers") == byCell(cell), s"cell $cell")
      assert(r.getAs[Double]("row_share") ==
        round6(byCell(cell).toDouble / byFrom(cell._1)))
    }
    assert(out.map(_.getAs[Long]("n_customers")).sum == pairs.length.toLong)
  }
}
