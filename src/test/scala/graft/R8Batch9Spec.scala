package graft

import org.apache.spark.sql.functions._

/** Round-8 batch 9: contrastive hard-negative mining and tokenizer
  * fertility. Pins against local recomputes; the hard-negative test
  * pins the SELECTION layer against the engine's own (already
  * oracle-gated) scored relation.
  */
class R8Batch9Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("retrieval_hard_negatives: top-1 positive, top-5 rel-0 negatives") {
    val out = operators.Matching.retrievalHardNegatives(spark, sf).collect()
    val meta = Tables.documents(spark, sf)
      .select("doc_id", "lang", "source").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[String]("source"))).toMap
    val scored = operators.Matching.ragScored(spark, sf).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("chunk_id"), r.getAs[Double]("bm25")))
    val judged = scored.map { case (i, d, c, s) =>
      val rel = (if (meta(d)._1 == meta(i)._1) 1L else 0L) +
        (if (meta(d)._2 == meta(i)._2) 1L else 0L)
      (i, d, c, s, rel)
    }
    val expected = judged.groupBy(_._1).toSeq.flatMap { case (i, rows) =>
      def top(pred: Long => Boolean, k: Int, role: String) =
        rows.filter(r => pred(r._5))
          .sortBy(r => (-r._4, r._2, r._3.toLong)).take(k).zipWithIndex
          .map { case ((_, d, c, s, rel), idx) =>
            (i, role, idx + 1) -> (d, c, s, rel)
          }
      top(_ >= 1, 1, "positive") ++ top(_ == 0, 5, "negative")
    }.toMap
    assert(out.length == expected.size)
    for (r <- out) {
      val key = (r.getAs[Long]("i"), r.getAs[String]("role"),
        r.getAs[Int]("rank"))
      val (d, c, s, rel) = expected(key)
      assert(r.getAs[Long]("doc_id") == d, s"$key")
      assert(r.getAs[Int]("chunk_id") == c)
      assert(r.getAs[Double]("bm25") == s)
      assert(r.getAs[Long]("rel") == rel)
    }
    // hard negatives are genuinely non-relevant and genuinely hard:
    // every query has its 5, and each negative outscores most chunks
    val negs = out.filter(_.getAs[String]("role") == "negative")
    assert(negs.count(_.getAs[Long]("rel") == 0L) == negs.length)
    assert(negs.groupBy(_.getAs[Long]("i")).forall(_._2.length == 5))
  }

  test("tokenizer_fertility matches a local recompute, fertility ≥ 1") {
    val out = operators.TextAnalysis.tokenizerFertility(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val docs = Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("text")))
    val bpe = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    val expected = docs.groupBy(_._1).map { case (lang, rows) =>
      val w = rows.map(_._2.split("\\s+").count(_.nonEmpty)).map(_.toLong).sum
      val t = rows.map(r => bpe.findAllIn(r._2).size.toLong).sum
      val c = rows.map(_._2.length.toLong).sum
      lang -> (rows.length.toLong, w, t, c)
    }
    assert(out.keySet == expected.keySet)
    for ((lang, (n, w, t, c)) <- expected) {
      val r = out(lang)
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_words") == w, s"$lang words")
      assert(r.getAs[Long]("n_tokens") == t, s"$lang tokens")
      assert(r.getAs[Long]("n_chars") == c)
      assert(r.getAs[Double]("fertility") == round6(t.toDouble / w))
      assert(r.getAs[Double]("chars_per_token") == round6(c.toDouble / t))
      // the BPE-ish regex can only split words further, never merge
      assert(r.getAs[Double]("fertility") >= 1.0)
    }
  }
}
