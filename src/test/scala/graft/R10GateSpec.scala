package graft

import org.apache.spark.sql.functions.col

/** Round-10 gate/regime hardening: the kNN-graph broadcast gate sizes
  * rows from the MEASURED vector dim and falls back to a salted label
  * join (not the known-bad plain shuffle); the LSH-candidate regime
  * of the ngram family logs its per-decile catch curve; the triangle
  * estimator no longer embeds its own ground truth; method-agreement
  * reads persisted per-method pair tables.
  */
class R10GateSpec extends SparkSpec {

  test("lshCatchProb: banded s-curve arithmetic (b=4, r=2)") {
    def ref(s: Double) = 1.0 - math.pow(1.0 - s * s, 4)
    for (s <- Seq(0.0, 0.3, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0))
      assert(math.abs(operators.Dedup.lshCatchProb(s) - ref(s)) < 1e-12)
    // the advertised design point: >= 98% at the 0.8 verify threshold
    assert(operators.Dedup.lshCatchProb(0.8) >= 0.98)
    // ...and the sweep's lowest bin is NOT near-total — the bias the
    // gate line must disclose (~68% at 0.5)
    assert(operators.Dedup.lshCatchProb(0.5) < 0.70)
    // generic (b, r): monotone in s, degenerate cases exact
    assert(operators.Dedup.lshCatchProb(1.0, 8, 4) == 1.0)
    assert(operators.Dedup.lshCatchProb(0.0, 8, 4) == 0.0)
    // the ngram family's OWN band shape (bitset-space LSH): ≥ 0.98 at
    // the 0.8 verify threshold, while the templated corpus's s≈0.5
    // background mass stays ~96% excluded
    val (b, r) = (operators.Dedup.NgramLshBands, operators.Dedup.NgramLshRows)
    assert(operators.Dedup.lshCatchProb(0.8, b, r) >= 0.98)
    assert(operators.Dedup.lshCatchProb(0.9, b, r) >= 0.9999)
    assert(operators.Dedup.lshCatchProb(0.5, b, r) < 0.05)
  }

  test("ngram LSH regime logs the per-decile catch curve; exact regime does not") {
    operators.Dedup.ngramJaccardScores(spark, sf, minJaccard = 0.5)
      .filter(col("jaccard") >= 0.5).count()
    val exact = GateLog.lastDecision("dedup_ngram_jaccard.regime", sf)
    assert(exact.exists(_.chosen == "exact"))
    assert(exact.exists(!_.detail.contains("catch_prob")),
      s"exact regime must not advertise an LSH catch curve: $exact")
    operators.Dedup.ngramJaccardScores(spark, sf,
      minJaccard = 0.5, exactPairBudget = 1.0)
      .filter(col("jaccard") >= 0.5).count()
    val capped = GateLog.lastDecision("dedup_ngram_jaccard.regime", sf)
    assert(capped.exists(_.chosen == "lsh_candidates"))
    val detail = capped.get.detail
    assert(detail.contains("min_jaccard=0.5"), detail)
    val (b, r) = (operators.Dedup.NgramLshBands, operators.Dedup.NgramLshRows)
    assert(detail.contains(s"catch_prob[b=$b,r=$r]"), detail)
    // the disclosed curve is the lshCatchProb arithmetic verbatim
    for (s <- Seq(0.5, 0.6, 0.7, 0.8, 0.9))
      assert(detail.contains(
        f"s$s%.1f=${operators.Dedup.lshCatchProb(s, b, r)}%.3f"), detail)
  }

  test("knn-graph corpus gate: dim-derived bytes, salted fallback is plan-equivalent") {
    val dflt = operators.Similarity
      .knnGraphEdges(spark, sf, operators.Similarity.KnnGraphBroadcastMaxBytes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val g = GateLog.lastDecision("knn_graph.corpus_side", sf)
    assert(g.exists(_.chosen == "broadcast"), s"default gate: $g")
    // estimate must carry the MEASURED dim, not a constant row guess
    val dim = Tables.embeddings(spark, sf)
      .selectExpr("size(embedding)").head().getInt(0)
    assert(g.exists(_.detail.contains(s"dim=$dim")), s"gate detail: $g")
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(g.exists(_.detail.contains(s"est=${nVecs * (64L + 8L * dim)}B")),
      s"gate detail: $g")
    // force the over-cap regime: salted label join, same edge set
    val salted = operators.Similarity.knnGraphEdges(spark, sf, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(GateLog.lastDecision("knn_graph.corpus_side", sf)
      .exists(_.chosen == "shuffle_salted"))
    assert(salted == dflt, "salted regime must emit the identical kNN graph")
  }

  test("knn-graph gate arithmetic at sf1/sf10/cluster-shaped stats") {
    def side(nVecs: Long, dim: Int,
             cap: Long = operators.Similarity.KnnGraphBroadcastMaxBytes) =
      if (nVecs * (64L + 8L * dim) <= cap) "broadcast" else "shuffle_salted"
    assert(side(20000L, 32) == "broadcast")    // sf1: 20k × 320 B
    assert(side(200000L, 32) == "broadcast")   // sf10: 200k × 320 B = 61 MiB
    assert(side(2000000L, 32) == "shuffle_salted") // sf100: 610 MiB > cap
    // a wider embedding column flips the SAME row count — the r9
    // hardcoded 320 B/row would have broadcast this and blown the heap
    assert(side(200000L, 4096) == "shuffle_salted") // 6.5 GiB corpus
  }

  test("triangle estimator: sampled-only query; audit carries exact + rel_error") {
    val est = operators.Graph.graphTriangleEstimate(spark, sf)
    assert(est.schema.fieldNames.toSeq ==
      Seq("sampled_triangles", "p", "estimate"))
    val audit = operators.Graph.graphTriangleEstimateAudit(spark, sf).head()
    assert(audit.getAs[Long]("exact_triangles") > 0L)
    val relErr = audit.getAs[Double]("rel_error")
    assert(relErr >= 0.0)
    // estimate = sampled / p^3 with p = 1/2
    assert(audit.getAs[Double]("estimate") ==
      audit.getAs[Long]("sampled_triangles") * 8.0)
  }

  test("method agreement reads persisted per-method pair tables and matches a live recompute") {
    val out = operators.Dedup.dedupMethodAgreement(spark, sf).collect()
    // the persisted index exists with all four published method tables
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val idx = tmp.listFiles().filter(d =>
      d.getName.startsWith("graft_dedup_pairs_") &&
        !d.getName.contains("_stage_"))
    assert(idx.nonEmpty, s"no published graft_dedup_pairs index under $tmp")
    for (d <- idx; m <- Seq("f_exact", "f_minhash", "f_ngram", "f_simhash"))
      assert(new java.io.File(d, s"$m/_SUCCESS").exists(),
        s"method table $m missing under $d")
    // live recompute of the same rollup from the method relations
    import org.apache.spark.sql.functions.{count => cnt, lit, max => mx, md5}
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val ex = docs.as("a").join(docs.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
    val sets = Seq(
      "f_exact" -> ex,
      "f_minhash" -> operators.Dedup.dedupMinhashLsh(spark, sf).select("i", "j"),
      "f_ngram" -> operators.Dedup.dedupNgramJaccard(spark, sf).select("i", "j"),
      "f_simhash" -> operators.Dedup.dedupSimhash(spark, sf).select("i", "j"))
    val names = sets.map(_._1)
    val flagged = sets.map { case (n, df) =>
      names.foldLeft(df)((acc, m) =>
        acc.withColumn(m, lit(if (m == n) 1L else 0L)))
    }.reduce(_ unionAll _)
    val want = flagged.groupBy("i", "j")
      .agg(mx(names.head).as(names.head),
        names.tail.map(m => mx(m).as(m)): _*)
      .groupBy(names.map(col): _*)
      .agg(cnt(lit(1)).as("n_pairs"))
      .collect()
      .map(r => names.map(r.getAs[Long]) -> r.getAs[Long]("n_pairs")).toMap
    val got = out
      .map(r => names.map(r.getAs[Long]) -> r.getAs[Long]("n_pairs")).toMap
    assert(got == want)
  }
}
