package graft

/** Cross-formulation equivalence for the batch ANN path. (A recall
  * floor vs brute force was evaluated and deliberately NOT pinned:
  * the driver's synthetic embeddings are near-uniform, so sign-bucket
  * or centroid proximity does not imply cosine proximity on this
  * data — measured IVF recall@10 is 1/5 and the 8-bit LSH bucket
  * often holds a single unrelated vector. The approximate variants'
  * CONTRACTS — search only the routed list / bucket — are pinned by
  * the DuckDB oracle instead.)
  */
class AnnRecallSpec extends SparkSpec {

  test("knn_batch per-query results match an independent window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = operators.Similarity.knnBatch(spark, sf)
      .select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val e = Tables.embeddings(spark, sf).selectExpr(
      "vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .withColumn("norm", expr(
        "sqrt(aggregate(v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    val expected = e.filter(col("vec_id") >= 8).crossJoin(broadcast(q))
      .withColumn("cosine", round(
        expr("aggregate(zip_with(v, qv, (a, b) -> a * b), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
          / (col("norm") * col("qn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("embed_cluster_margin: agrees with the kmeans assignment; margins ordered in [0,1]") {
    val rows = operators.Similarity.embedClusterMargin(spark, sf).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.length == 25)
    val margins = rows.map(_.getAs[Double]("margin"))
    assert(margins.zip(margins.tail).forall { case (a, b) => a <= b },
      "rank order is ascending ambiguity")
    assert(margins.forall(m => m >= 0.0 && m <= 1.0))
    // nearest cluster and distance must equal the kmeans assignment
    val assign = operators.Similarity.clusterKmeans(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (c, d) = assign(r.getAs[Long]("vec_id"))
      assert(r.getAs[Int]("cluster") == c && r.getAs[Double]("dist2") == d,
        s"vec ${r.getAs[Long]("vec_id")} must mirror its kmeans row")
    }
  }

  test("knn_recall_pq: one summary row, recall = |ivfpq∩truth|/5 recomputed locally") {
    val row = operators.Similarity.knnRecallPq(spark, sf).head()
    val truth = operators.Similarity.knnBrute(spark, sf)
      .filter(org.apache.spark.sql.functions.col("rank") <= 5)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val got = operators.Similarity.knnIvfPq(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val hits = (truth intersect got).size
    assert(row.getAs[Long]("k") == 5L)
    assert(row.getAs[Long]("n_hits") == hits.toLong)
    assert(row.getAs[Double]("recall") ==
      BigDecimal(hits / 5.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(hits > 0, "the lossy stack must find at least one true neighbor here")
  }
}
