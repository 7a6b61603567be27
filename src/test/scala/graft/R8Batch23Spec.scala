package graft

import org.apache.spark.sql.functions.{col, expr}

/** Round-8 batch 23: hybrid RRF retrieval fusion, embedding
  * anisotropy histogram, AU postcode geography, purchase cadence.
  * Local recompute pins at sf0.001.
  */
class R8Batch23Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("retrieval_rrf_fusion: RRF reconstructs from the two rank lists") {
    val out = operators.Matching.retrievalRrfFusion(spark, sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val rs = Option(r.getAs[Integer]("rank_sparse")).map(_.toInt)
      val rd = Option(r.getAs[Integer]("rank_dense")).map(_.toInt)
      // at least one ranker proposed the doc
      assert(rs.isDefined || rd.isDefined)
      val expected = rs.map(v => 1.0 / (60.0 + v)).getOrElse(0.0) +
        rd.map(v => 1.0 / (60.0 + v)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf_score") == round6(expected))
      assert(rs.forall(v => v >= 1 && v <= 20))
      assert(rd.forall(v => v >= 1 && v <= 20))
    }
    // exactly 5 fused results per query, ranks 1..5, rrf non-increasing
    val byQ = out.groupBy(_.getAs[Long]("i"))
    for ((_, rows) <- byQ) {
      assert(rows.length == 5)
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4, 5))
      val scores = sorted.map(_.getAs[Double]("rrf_score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // a doc ranked top by BOTH lists must beat a doc in only one
    for ((_, rows) <- byQ) {
      val both = rows.filter(r => r.get(r.fieldIndex("rank_sparse")) != null
        && r.get(r.fieldIndex("rank_dense")) != null)
      val only = rows.filter(r => r.get(r.fieldIndex("rank_sparse")) == null
        || r.get(r.fieldIndex("rank_dense")) == null)
      if (both.nonEmpty && only.nonEmpty)
        assert(both.map(_.getAs[Double]("rrf_score")).max >=
          only.map(_.getAs[Double]("rrf_score")).min)
    }
  }

  test("embed_cosine_histogram matches a local stride-pair recompute") {
    val out = operators.Similarity.embedCosineHistogram(spark, sf).collect()
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Double]]("v").toArray).toMap
    val n = vecs.size.toLong
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      for (k <- a.indices) { d += a(k) * b(k); na += a(k) * a(k); nb += b(k) * b(k) }
      round6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val pairs = for {
      id <- vecs.keys.toSeq
      s <- Seq(1L, 17L, 101L)
      p = (id + s) % n
      if p != id
    } yield cos(vecs(id), vecs(p))
    val byBucket = pairs.groupBy(c =>
      math.min(9L, math.max(0L, math.floor((c + 1.0) * 5).toLong)))
    assert(out.length == byBucket.size)
    for (r <- out) {
      val b = r.getAs[Long]("bucket")
      val cs = byBucket(b)
      assert(r.getAs[Long]("n_pairs") == cs.length.toLong)
      assert(r.getAs[Double]("share") ==
        round6(cs.length.toDouble / pairs.length))
      val sU6 = cs.map(c => math.round(c * 1e6)).sum
      assert(r.getAs[Double]("avg_cos") ==
        round6(sU6.toDouble / cs.length / 1e6))
    }
  }

  test("clean_postcode_states: ranges partition the register") {
    val out = operators.Cleaning.cleanPostcodeStates(spark, sf).collect()
    val custs = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getAs[Long]("c_custkey"),
        r.getAs[Number]("c_nationkey").longValue))
    def stateOf(ck: Long, nk: Long): String = {
      if (ck % 5 == 0) return "INVALID" // '99' fails the 4-digit rule
      val p = (nk * 100 + ck % 100).toInt
      if ((p >= 1000 && p <= 2599) || (p >= 2619 && p <= 2899) ||
        (p >= 2921 && p <= 2999)) "NSW"
      else if ((p >= 200 && p <= 299) || (p >= 2600 && p <= 2618) ||
        (p >= 2900 && p <= 2920)) "ACT"
      else if ((p >= 3000 && p <= 3999) || (p >= 8000 && p <= 8999)) "VIC"
      else if ((p >= 4000 && p <= 4999) || (p >= 9000 && p <= 9999)) "QLD"
      else if (p >= 5000 && p <= 5999) "SA"
      else if (p >= 6000 && p <= 6999) "WA"
      else if (p >= 7000 && p <= 7999) "TAS"
      else if (p >= 800 && p <= 999) "NT"
      else "UNKNOWN"
    }
    val byState = custs.map { case (ck, nk) =>
      (stateOf(ck, nk), if (ck % 3 == 0) 1L else 0L)
    }.groupBy(_._1)
    assert(out.length == byState.size)
    for (r <- out) {
      val st = r.getAs[String]("state")
      val rows = byState(st)
      assert(r.getAs[Long]("n_entities") == rows.length.toLong, st)
      assert(r.getAs[Long]("n_active") == rows.map(_._2).sum, st)
      assert(r.getAs[Double]("share") ==
        round6(rows.length.toDouble / custs.length))
    }
    assert(out.map(_.getAs[Long]("n_entities")).sum == custs.length)
  }

  test("events_purchase_cadence matches a local gap recompute") {
    val out = operators.Events.eventsPurchaseCadence(spark, sf).collect()
    val days = Tables.events(spark, sf)
      .filter("event_type = 'purchase'")
      .select(col("user_id"), expr("ts_s div 86400").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
    val gaps = days.groupBy(_._1).values.toSeq.flatMap { ds =>
      val s = ds.map(_._2).sorted
      s.zip(s.drop(1)).map { case (a, b) => b - a }
    }
    def bucketOf(g: Long): Long =
      if (g == 1) 0 else if (g <= 3) 1 else if (g <= 7) 2
      else if (g <= 14) 3 else if (g <= 30) 4 else 5
    val byBucket = gaps.groupBy(bucketOf)
    assert(out.length == byBucket.size)
    for (r <- out) {
      val b = r.getAs[Long]("bucket_order")
      val gs = byBucket(b)
      assert(r.getAs[Long]("n_gaps") == gs.length.toLong)
      assert(r.getAs[Double]("share") ==
        round6(gs.length.toDouble / gaps.length))
      assert(r.getAs[Double]("avg_gap_days") ==
        round6(gs.sum.toDouble / gs.length))
    }
  }
}
