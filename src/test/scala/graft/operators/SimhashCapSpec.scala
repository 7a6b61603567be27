package graft.operators

import org.apache.spark.sql.functions._

/** Pins dedup_simhash's hot-bucket cap (Dedup.SimhashBucketCap): a
  * signature bucket with more members than the cap reports as a
  * hub→member STAR (k−1 rows, hub = min doc_id) instead of its
  * C(k,2) clique — the bound that keeps the pair table linear when a
  * duplicate family goes large (measured at sf10: 460M clique rows,
  * 97% of the method-agreement audit's input, from one corpus's hot
  * signatures). Both regimes are forced on a PLANTED corpus — one
  * 20-member identical-text family (hot at cap 16), one 5-member
  * family (warm), two singletons — and cross-checked against the
  * uncapped clique form:
  *
  *  - family equality: per signature, the capped member set (i ∪ j)
  *    must equal the uncapped one — the star loses no member;
  *  - hot shape: exactly k−1 rows, every i = the family's min id;
  *  - warm shape: pair-for-pair identical to the uncapped clique;
  *  - bound: capped rows ≤ C(cap,2)·buckets + Σ hot (k−1).
  */
class SimhashCapSpec extends graft.SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("simhash_cap_fix").toString
    import spark.implicits._
    val hot = (1L to 20L).map(i => (i, "alpha beta gamma delta epsilon"))
    val warmF = (100L to 104L).map(i => (i, "zeta eta theta iota kappa"))
    val singles = Seq((200L, "lambda mu nu xi omicron pi rho"),
      (201L, "sigma tau upsilon phi chi psi omega"))
    (hot ++ warmF ++ singles).toDF("doc_id", "text")
      .withColumn("source", lit("fixture"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def members(rows: Seq[(Long, Long, Long)]): Map[Long, Set[Long]] =
    rows.groupBy(_._3).map { case (sh, ps) =>
      sh -> ps.flatMap(p => Seq(p._1, p._2)).toSet
    }

  test("hot buckets star from the min member; warm buckets keep exact cliques; families survive") {
    val capped = Dedup.dedupSimhash(spark, dir, Dedup.SimhashBucketCap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val uncapped = Dedup.dedupSimhash(spark, dir, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // the fixture must actually exercise both regimes
    val famSizes = members(uncapped).view.mapValues(_.size).toMap
    assert(famSizes.values.exists(_ > Dedup.SimhashBucketCap),
      s"fixture grew no hot bucket: $famSizes")
    assert(famSizes.values.exists(s => s >= 2 && s <= Dedup.SimhashBucketCap),
      s"fixture grew no warm bucket: $famSizes")

    // family equality: no member lost by the star representation
    assert(members(capped) == members(uncapped))

    famSizes.foreach { case (sh, k) =>
      val cRows = capped.filter(_._3 == sh)
      val uRows = uncapped.filter(_._3 == sh)
      if (k > Dedup.SimhashBucketCap) {
        val hub = members(uncapped)(sh).min
        assert(cRows.size == k - 1, s"hot bucket $sh: ${cRows.size} != ${k - 1}")
        assert(cRows.forall(_._1 == hub), s"hot bucket $sh must star from $hub")
        assert(uRows.size == k.toLong * (k - 1) / 2)
      } else {
        assert(cRows.toSet == uRows.toSet, s"warm bucket $sh must keep its clique")
      }
    }

    // the linear bound that holds at any corpus size
    val nBuckets = famSizes.size
    val cap = Dedup.SimhashBucketCap
    val bound = cap.toLong * (cap - 1) / 2 * nBuckets +
      famSizes.values.filter(_ > cap).map(_ - 1L).sum
    assert(capped.size <= bound)
  }
}
