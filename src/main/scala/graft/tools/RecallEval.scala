package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Matching}

/** Recall-vs-exact eval for the three CAPPED candidate regimes
  * (match_tfidf_topk / match_bm25_topk impact-capped postings,
  * dedup_ngram_jaccard MinHash-LSH candidates): force each gate at a
  * scale factor where the EXACT regime is still affordable, score the
  * capped answer against the exact answer, and emit the recall table
  * a 100-TB deployment needs before trusting the gate — the reference
  * quotes raw thresholds (entity_matching_tfidf.py: cosine ≥ 0.7;
  * entity_matching_optimized.py:85: ratio ≥ 85) that are meaningful
  * only under known candidate recall.
  *
  * Metrics:
  *  - matchers (top-1-per-query shape): query coverage (capped
  *    answered / exact answered), top-1 agreement (same argmax doc),
  *    and score-exactness on agreeing pairs (must be 1.0 — the capped
  *    regime scores candidates with the identical native dot).
  *  - ngram dedup (pair-set shape): pair-level recall per jaccard
  *    decile (≥0.5 … ≥0.9 bins) next to the THEORETICAL banded-LSH
  *    catch probability 1−(1−s²)⁴ ([[Dedup.lshCatchProb]]), plus the
  *    headline recall at the 0.8 verify threshold.
  *
  * Usage: `sbt "runMain graft.tools.RecallEval <sfDir> [out.json]"`.
  * One JSON object on stdout and in the out file.
  */
object RecallEval {

  private def top1Map(df: DataFrame): Map[Long, (Long, Double)] =
    df.collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2))
    }.toMap

  /** Compare capped vs exact top-1 maps. Beyond argmax agreement,
    * SCORE REGRET@1 (exact top-1 score − capped top-1 score, relative)
    * is reported: on a templated shared-vocabulary corpus thousands
    * of docs tie at the top to within rounding, so a disagreeing
    * argmax that loses ~0 score is a tie-break artifact, not a
    * candidate-recall failure — regret is the metric that separates
    * the two.
    */
  private def matcherMetrics(name: String, exact: Map[Long, (Long, Double)],
                             capped: Map[Long, (Long, Double)],
                             extraJson: String = ""): String = {
    val answered = exact.keySet
    val covered = answered.intersect(capped.keySet)
    val agree = covered.count(i => capped(i)._1 == exact(i)._1)
    val scoreExact = covered.count(i =>
      capped(i)._1 == exact(i)._1 && capped(i)._2 == exact(i)._2)
    val regrets = covered.toSeq.map { i =>
      val e = exact(i)._2
      if (e <= 0) 0.0 else math.max(e - capped(i)._2, 0.0) / e
    }.sorted
    def pct(p: Double): Double =
      if (regrets.isEmpty) 0.0
      else regrets(math.min(regrets.size - 1, (p * regrets.size).toInt))
    val zeroRegret =
      if (covered.isEmpty) 1.0
      else regrets.count(_ <= 1e-6).toDouble / covered.size
    f"""  "$name": {"n_exact": ${exact.size}, "n_capped": ${capped.size},
       |    "query_coverage": ${covered.size.toDouble / answered.size}%.6f,
       |    "top1_agreement": ${agree.toDouble / answered.size}%.6f,
       |    "score_exact_on_agreed": ${
            if (agree == 0) 1.0 else scoreExact.toDouble / agree}%.6f,
       |    "zero_regret_frac": $zeroRegret%.6f,
       |    "regret_p50": ${pct(0.50)}%.6f, "regret_p95": ${pct(0.95)}%.6f,
       |    "regret_p99": ${pct(0.99)}%.6f, "regret_max": ${pct(1.0)}%.6f$extraJson}""".stripMargin
  }

  private def bins(df: DataFrame): Map[Long, Long] = df
    .withColumn("bin_x10", expr(
      "CAST(round(jaccard * 1000000) AS BIGINT) div 100000"))
    .groupBy("bin_x10").agg(count(lit(1)).as("n"))
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Per-decile recall JSON for a pair-set family, exact vs capped
    * bin counts, with the band shape's theoretical catch at each
    * bin's low edge alongside.
    */
  private def ngramSectionJson(name: String, regime: String,
      be: Map[Long, Long], bc: Map[Long, Long],
      extraJson: String = ""): String = {
    val decileRows = (5L to 9L).map { b =>
      val ne = be.getOrElse(b, 0L); val nc = bc.getOrElse(b, 0L)
      val rec = if (ne == 0) 1.0 else nc.toDouble / ne
      val s = b / 10.0
      val th = Dedup.lshCatchProb(s, Dedup.NgramLshBands, Dedup.NgramLshRows)
      f"""    {"bin": "[${s}%.1f,${s + 0.1}%.1f)", "n_exact": $ne, "n_capped": $nc,
         |     "recall": $rec%.6f, "lsh_catch_theory_low_edge": $th%.6f}""".stripMargin
    }
    val e08 = (8L to 10L).map(b => be.getOrElse(b, 0L)).sum
    val c08 = (8L to 10L).map(b => bc.getOrElse(b, 0L)).sum
    f"""  "$name": {
       |    "regime": "$regime",
       |    "recall_at_verify_0.8": ${
          if (e08 == 0) 1.0 else c08.toDouble / e08}%.6f,
       |    "n_exact_ge_0.8": $e08, "n_capped_ge_0.8": $c08$extraJson,
       |    "deciles": [
       |${decileRows.mkString(",\n")}
       |  ]}""".stripMargin
  }

  /** Deterministic doc subsample rates for the second-decade
    * (production-regime) protocol: exact truth at sf10 is unaffordable
    * in full (2.5e10 ngram pairs, 6.25e10 matcher pairs), so truth is
    * computed EXACTLY on a deterministic 1-in-K subset — doc-mod for
    * the pair-set family (both endpoints sampled ⇒ pair kept with
    * p=1/K²), query-mod for the matchers ([[graft.operators.Matching
    * .querySide]]: stats/corpus untouched, so a sampled query's exact
    * top-1 IS its full-run top-1). tfidf samples 10× thinner than
    * bm25: its exact path at sf10 is the sparse prefix join, ~10×
    * the per-query cost of bm25's dense scan.
    */
  val NgramDocSample = 30L
  val Bm25QuerySample = 100L
  val TfidfQuerySample = 1000L

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "RECALL_EVAL.json"
    // iteration aid: restrict to one section
    // (all | matchers | ngram | sf10 | sf10_ngram | sf10_matchers)
    val sections = if (args.length > 2) args(2) else "all"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftSession.builder(s"local[$cpus]", math.max(cpus, 4))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.registerInto(spark)

    val parts = scala.collection.mutable.ArrayBuffer.empty[String]

    // ---- ngram-jaccard: pair recall per decile under LSH candidates
    if (sections == "all" || sections == "ngram") {
    val exactScores = Dedup.ngramJaccardScores(spark, sfDir, minJaccard = 0.5)
      .filter(col("jaccard") >= 0.5)
    val cappedScores = Dedup.ngramJaccardScores(spark, sfDir,
      minJaccard = 0.5, exactPairBudget = 1.0)
      .filter(col("jaccard") >= 0.5)
    parts += ngramSectionJson("dedup_ngram_jaccard",
      "lsh_candidates (forced)", bins(exactScores), bins(cappedScores))
    }

    // ---- second decade: at the passed dir the capped gates are the
    // PRODUCTION regime (nothing forced); truth is exact on a
    // deterministic 1-in-K subset (see the sample-rate scaladoc).
    if (sections == "sf10" || sections == "sf10_ngram") {
      // both-endpoints-sampled pair recall: an exact all-pairs run
      // over the 1-in-30 doc subset is affordable at any decade
      // (pair volume shrinks 900×) and every subset pair's jaccard
      // is identical to its full-corpus score (pair-local metric)
      val sub = "/tmp/recall_truth_subset"
      graft.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % NgramDocSample === 0)
        .write.mode("overwrite").parquet(s"$sub/documents.parquet")
      graft.PlanCache.invalidate(sub)
      val exact = Dedup.ngramJaccardScores(spark, sub, minJaccard = 0.5)
        .filter(col("jaccard") >= 0.5)
      val capped = Dedup.ngramJaccardScores(spark, sfDir, minJaccard = 0.5)
        .filter(col("jaccard") >= 0.5)
        .filter(col("i") % NgramDocSample === 0 &&
          col("j") % NgramDocSample === 0)
      parts += ngramSectionJson("dedup_ngram_jaccard_sf10",
        "lsh_candidates (production)", bins(exact), bins(capped),
        s""", "doc_sample": $NgramDocSample""")
    }
    if (sections == "sf10" || sections == "sf10_matchers") {
      // capped side = the PRODUCTION run (its timing is the shipped
      // sf10 cost), result map filtered to the sampled queries whose
      // exact truth the querySample run computes against the full
      // corpus with identical stats
      def timed[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (bm25Cap, bm25Secs) = timed(
        top1Map(Matching.matchBm25Topk(spark, sfDir)))
      val bm25Exact = top1Map(Matching.matchBm25Topk(spark, sfDir,
        denseVocabMax = 4096, querySample = Bm25QuerySample))
      parts += matcherMetrics("match_bm25_topk_sf10", bm25Exact,
        bm25Cap.filter { case (i, _) => (i / 2) % Bm25QuerySample == 0 },
        f""",
           |    "query_sample": $Bm25QuerySample, "capped_seconds": $bm25Secs%.1f""".stripMargin)
      val (tfidfCap, tfidfSecs) = timed(
        top1Map(Matching.matchTfidfTopk(spark, sfDir)))
      val tfidfExact = top1Map(Matching.matchTfidfTopk(spark, sfDir,
        denseVocabMax = 4096, querySample = TfidfQuerySample))
      parts += matcherMetrics("match_tfidf_topk_sf10", tfidfExact,
        tfidfCap.filter { case (i, _) => (i / 2) % TfidfQuerySample == 0 },
        f""",
           |    "query_sample": $TfidfQuerySample, "capped_seconds": $tfidfSecs%.1f""".stripMargin)
    }

    // ---- tfidf / bm25: forced capped regime vs the exact regime.
    // exactPairBudget = CappedAdmitPairs keeps the admitted-pair cap
    // at its production value (5e7) while forcing the regime flip.
    val forced = Matching.CappedAdmitPairs
    if (sections == "all" || sections == "matchers") {
    val tfidfExact = top1Map(Matching.matchTfidfTopk(spark, sfDir))
    val tfidfCapped = top1Map(Matching.matchTfidfTopk(spark, sfDir,
      denseVocabMax = 4096, exactPairBudget = forced))
    parts += matcherMetrics("match_tfidf_topk", tfidfExact, tfidfCapped)
    val bm25Exact = top1Map(Matching.matchBm25Topk(spark, sfDir))
    val bm25Capped = top1Map(Matching.matchBm25Topk(spark, sfDir,
      denseVocabMax = 4096, exactPairBudget = forced))
    parts += matcherMetrics("match_bm25_topk", bm25Exact, bm25Capped)
    // the budget IS the recall knob: one more point on the curve at
    // 4x the production cap, so a deployment can read agreement-vs-
    // budget instead of a single number
    val bm25Capped4x = top1Map(Matching.matchBm25Topk(spark, sfDir,
      denseVocabMax = 4096, exactPairBudget = 4 * forced,
      admitPairBudget = 4 * forced))
    parts += matcherMetrics("match_bm25_topk_budget_4x", bm25Exact, bm25Capped4x)
    }

    val json = s"""{\n  "sf_dir": "$sfDir",\n  "forced_admit_cap": $forced,\n""" +
      parts.mkString(",\n") + "\n}"
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    graft.PlanCache.clear()
    spark.stop()
  }
}
