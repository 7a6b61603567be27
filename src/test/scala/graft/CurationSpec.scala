package graft

import org.apache.spark.sql.functions._

/** Invariants for the training-data curation operators added in
  * round 3: LM-based quality scoring, repetition filters, substring
  * dedup, benchmark decontamination, mixing, and clustering.
  */
class CurationSpec extends SparkSpec {

  test("perplexity: corpus-trained unigram LM gives nonnegative NLL, ppl = exp(nll)") {
    val out = operators.TextAnalysis.textPerplexity(spark, sf)
    assert(out.filter(col("avg_nll") < 0).count() == 0,
      "token probability can't exceed 1, so avg NLL >= 0")
    assert(out.filter(col("ppl") < 1.0).count() == 0)
    // every doc is scored
    assert(out.count() == Tables.documents(spark, sf).count())
  }

  test("repetition: fractions bounded, verdict follows the rounded thresholds") {
    val out = operators.TextAnalysis.textRepetition(spark, sf).persist()
    assert(out.filter(col("dup_word_frac") < 0 || col("dup_word_frac") >= 1).count() == 0)
    assert(out.filter(col("top_bigram_frac") < 0).count() == 0)
    val bad = out.filter(
      (col("verdict") === "drop") =!=
        (col("top_bigram_frac") > 0.20 || col("top_trigram_frac") > 0.18)).count()
    assert(bad == 0, "verdict must be a pure function of the rounded fractions")
    out.unpersist()
  }

  test("substring dedup: containment in (0,1], exact dups hit containment 1") {
    val out = operators.Dedup.dedupSubstring(spark, sf).persist()
    assert(out.filter(col("containment") <= 0 || col("containment") > 1).count() == 0)
    assert(out.filter(col("i") >= col("j")).count() == 0)
    // doc pairs with identical text must surface with full containment
    // (only families the operator can see: its chunking needs >= 64
    // chars of text)
    val exact = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 64)
      .groupBy(md5(col("text"))).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).count()
    if (exact > 0)
      assert(out.filter(col("containment") === 1.0).count() > 0)
    out.unpersist()
  }

  test("contamination: reported pairs are train-vs-benchmark with >= 3 shared grams") {
    val out = operators.Dedup.contaminationNgram(spark, sf).persist()
    assert(out.filter(col("doc_id") % 10 === 0).count() == 0, "train side only")
    assert(out.filter(col("bench_id") % 10 =!= 0).count() == 0, "benchmark side only")
    assert(out.filter(col("n_shared") < 3).count() == 0)
    out.unpersist()
  }

  test("weighted mix: rates equalize source token budgets, kept docs obey the threshold") {
    val out = operators.Sampling.sampleWeightedMix(spark, sf).persist()
    assert(out.filter(col("u") >= col("rate")).count() == 0)
    assert(out.filter(col("rate") <= 0 || col("rate") > 1).count() == 0)
    // the smallest source is kept whole (rate 1), so it survives intact
    val bySrc = Tables.documents(spark, sf)
      .withColumn("n", size(split(col("text"), "\\s+")))
      .groupBy("source").agg(sum("n").as("tok"), count(lit(1)).as("docs"))
    val minSrc = bySrc.orderBy("tok").head
    val keptMin = out.filter(col("source") === minSrc.getAs[String]("source")).count()
    assert(keptMin == minSrc.getAs[Long]("docs"), "budget source must keep all docs")
    out.unpersist()
  }

  test("kmeans: full assignment, k-bounded ids, Lloyd update does not increase inertia") {
    val out = operators.Similarity.clusterKmeans(spark, sf).persist()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.count() == n, "every vector assigned")
    assert(out.filter(col("cluster") < 0 || col("cluster") >= 8).count() == 0)
    // round-2 assignment against updated centroids must not be worse
    // than round-1 against the seed centroids (Lloyd monotonicity;
    // 1e-3 slack for the per-dimension centroid rounding)
    val e = Tables.embeddings(spark, sf).select(
      col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("n2", functions.VectorExprs.dot(col("v"), col("v")))
    val init = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("c"),
        functions.VectorExprs.dot(col("v"), col("v")).as("c2"))
    val inertia1 = e.crossJoin(broadcast(init))
      .withColumn("d2", col("n2") - lit(2.0) * functions.VectorExprs.dot(col("v"), col("c")) + col("c2"))
      .groupBy("vec_id").agg(min("d2").as("d2"))
      .agg(sum("d2")).head.getDouble(0)
    val inertia2 = out.agg(sum("dist2")).head.getDouble(0)
    assert(inertia2 <= inertia1 + 1e-3, s"inertia rose: $inertia1 -> $inertia2")
    out.unpersist()
  }
}
