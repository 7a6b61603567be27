package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Round-8 batch 6: ranking eval (AUC), the hashing-trick featurizer,
  * and CDC merge-apply. Each test pins the operator against an
  * independent local recomputation (the oracle gate checks DuckDB
  * parity; these pin the SEMANTICS).
  */
class R8Batch6Spec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("quality_auc equals the exact tie-aware Mann-Whitney statistic") {
    val out = operators.Governance.qualityAuc(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    // independent local recompute from the two source relations
    val sc = operators.TextAnalysis.qualityClassifier(spark, sf)
      .select("doc_id", "score").collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score")).toMap
    val pos = operators.TextAnalysis.textQuality(spark, sf)
      .select("doc_id", "quality_bucket").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("quality_bucket") == "ok")).toMap
    val pairs = sc.keys.toSeq.sorted.map(id => (sc(id), pos(id)))
    val nPos = pairs.count(_._2).toLong
    val nNeg = pairs.size - nPos
    // brute-force over all pos x neg pairs (sf0.001 is small enough)
    var num2 = 0L
    for ((sp, p) <- pairs if p; (sn, n) <- pairs if !n) {
      if (sp > sn) num2 += 2L else if (sp == sn) num2 += 1L
    }
    val auc = BigDecimal(num2.toDouble / (2.0 * nPos.toDouble * nNeg.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_pos") == nPos && r.getAs[Long]("n_neg") == nNeg)
    assert(r.getAs[Double]("auc") == auc,
      s"engine ${r.getAs[Double]("auc")} vs brute $auc")
    // a quality model trained on the same features should rank far
    // better than chance — and AUC is bounded
    val a = r.getAs[Double]("auc")
    assert(a > 0.5 && a <= 1.0)
  }

  test("text_feature_hashing matches a local hashing-trick recompute") {
    val out = operators.TextAnalysis.textFeatureHashing(spark, sf).collect()
      .map(r => r.getAs[Int]("dim") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_distinct_tokens"),
          r.getAs[Long]("n_occ"), r.getAs[Long]("sum_w"), r.getAs[Long]("ss_w")))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    // local recompute: dim = first-2-nibble parse % 64, sign = nibble-3 parity
    def dim(tok: String): Int =
      (java.lang.Long.parseLong(md5hex(tok).substring(0, 2), 16) % 64).toInt
    def sign(tok: String): Long =
      if (java.lang.Long.parseLong(md5hex(tok).substring(2, 3), 16) % 2 == 0) 1L
      else -1L
    val perDocDim = scala.collection.mutable.Map[(Long, Int), (Long, Long)]()
    val tokDim = scala.collection.mutable.Map[Int, scala.collection.mutable.Set[String]]()
    for ((id, text) <- docs; tok <- text.split("\\s+")) {
      val d = dim(tok)
      val (w, n) = perDocDim.getOrElse((id, d), (0L, 0L))
      perDocDim((id, d)) = (w + sign(tok), n + 1)
      tokDim.getOrElseUpdate(d, scala.collection.mutable.Set[String]()) += tok
    }
    val expected = perDocDim.groupBy(_._1._2).map { case (d, m) =>
      d -> (m.size.toLong, tokDim(d).size.toLong, m.values.map(_._2).sum,
        m.values.map(_._1).sum, m.values.map(v => v._1 * v._1).sum)
    }
    assert(out == expected, s"engine $out vs local $expected")
  }

  test("cdc_apply_latest: delete tombstones win; latest payload survives") {
    val out = operators.Olap.cdcApplyLatest(spark, sf).collect()
      .map(r => r.getAs[Long]("o_custkey") -> r).toMap
    val ch = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp").cast("long").as("seq_s"),
        col("o_orderstatus"), round(col("o_totalprice"), 2).as("p"))
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Long]("seq_s"), r.getAs[String]("o_orderstatus"),
        r.getAs[Double]("p")))
    val byKey = ch.groupBy(_._1)
    for ((k, rows) <- byKey) {
      val latest = rows.maxBy(r => (r._3, r._2))
      if (latest._4 == "F") {
        assert(!out.contains(k), s"custkey $k survived its delete tombstone")
      } else {
        assert(out.contains(k), s"custkey $k missing from the snapshot")
        val r = out(k)
        assert(r.getAs[Long]("last_orderkey") == latest._2)
        assert(r.getAs[Double]("last_price") == latest._5)
        assert(r.getAs[Long]("n_changes") == rows.length.toLong)
        assert(r.getAs[Long]("n_deletes") ==
          rows.count(_._4 == "F").toLong)
      }
    }
    // the dataset actually exercises both branches
    assert(byKey.exists { case (_, rows) => rows.maxBy(r => (r._3, r._2))._4 == "F" })
    assert(out.nonEmpty)
  }
}
