package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-5 curation operators: canonical dup-family election,
  * DSIR importance weights, quality-ranked token-budget selection.
  */
class Round5OpsSpec extends SparkSpec {

  test("dedup_keep_best: one keeper per family, always a longest member") {
    val out = operators.Dedup.dedupKeepBest(spark, sf).cache()
    assert(out.count() > 0, "test corpus has duplicate families")
    // exactly one keeper per family
    val perFam = out.groupBy("component")
      .agg(sum("is_keeper").as("k"), count(lit(1)).as("n"),
        max("n_tokens").as("max_t"))
    assert(perFam.filter(col("k") =!= 1).count() == 0, "one keeper per family")
    assert(perFam.filter(col("n") < 2).count() == 0, "families have >= 2 members")
    // the keeper is a longest member of its family
    val keepers = out.filter(col("is_keeper") === 1)
      .select(col("component"), col("n_tokens").as("kept_t"))
    assert(keepers.join(perFam, "component")
      .filter(col("kept_t") =!= col("max_t")).count() == 0,
      "keeper must have the family's max token count")
    out.unpersist()
  }

  test("text_dsir: English docs score higher under the English-target LM") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val scored = operators.TextAnalysis.textDsir(spark, sf).join(docs, "doc_id")
    val byLang = scored.groupBy(col("lang") === "en")
      .agg(avg("avg_log_ratio").as("m"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(byLang(true) > byLang(false),
      s"importance weights must favor the target domain: $byLang")
  }

  test("sample_token_budget: binned two-phase selection equals the global-window rule") {
    val got = operators.Sampling.sampleTokenBudget(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // naive reference: one global cumulative window (fine at sf0.001)
    val stop = Seq("the", "a", "or", "and")
    val s = Tables.documents(spark, sf)
      .withColumn("t", split(col("text"), "\\s+"))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("n_stop", expr(
        s"size(filter(t, x -> x IN (${stop.map("'" + _ + "'").mkString(",")})))").cast("long"))
      .withColumn("score",
        lit(1.0) - col("n_stop").cast("double") / col("n_tokens").cast("double"))
    val budget = s.agg(sum("n_tokens")).head.getLong(0) * 0.25
    val w = Window.orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = s.withColumn("pre", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("pre") < budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want,
      s"two-phase must equal the single-window rule: ${(got diff want).take(5)} / ${(want diff got).take(5)}")
    assert(got.nonEmpty && got.size < Tables.documents(spark, sf).count(),
      "selection is a strict, non-empty subset")
  }

  test("contamination_minhash: exactly the near-dup pairs that cross the test/train split") {
    val split = operators.Sampling.sampleHashSplit(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = operators.Dedup.contaminationMinhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every reported pair is test-side i, train-side j
    assert(got.forall { case (i, j) =>
      split(i) == "test" && split(j) == "train" }, got.take(5).toString)
    // and the gate finds ALL within-corpus near-dup pairs that cross
    // the split (in either orientation), no more, no fewer
    val all = operators.Dedup.dedupMinhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = all.flatMap { case (a, b) =>
      if (split(a) == "test" && split(b) == "train") Some((a, b))
      else if (split(b) == "test" && split(a) == "train") Some((b, a))
      else None
    }
    assert(got == want, s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
  }

  test("sample_priority: weighted without-replacement sample favors heavier docs") {
    val n = Tables.documents(spark, sf).count()
    val k = 100
    val out = operators.Sampling.samplePriority(spark, sf, k).collect()
    assert(out.length == math.min(k, n).toInt)
    assert(out.map(_.getLong(0)).distinct.length == out.length, "without replacement")
    // ES-sampling property: the sampled mean weight exceeds the corpus
    // mean (heavier docs are proportionally more likely)
    val sampledMean = out.map(_.getLong(1)).sum.toDouble / out.length
    val corpusMean = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head.getDouble(0)
    assert(sampledMean > corpusMean,
      s"weighted sample mean $sampledMean must exceed corpus mean $corpusMean")
  }

  test("table_profile: per-column stats agree with direct aggregates") {
    val o = Tables.orders(spark, sf)
    val rows = operators.Quality.tableProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("o_orderkey", "o_custkey", "o_totalprice",
      "o_orderdate", "o_orderstatus", "o_orderpriority"))
    val n = o.count()
    assert(rows.values.forall(_.getLong(1) == n))
    assert(rows("o_orderkey").getLong(3) == n, "order keys are unique")
    assert(rows("o_orderstatus").getLong(3) ==
      o.select("o_orderstatus").distinct().count())
    assert(rows("o_orderstatus").isNullAt(4) && rows("o_orderstatus").isNullAt(5),
      "string columns carry no numeric min/max")
    assert(rows("o_totalprice").getDouble(4) <= rows("o_totalprice").getDouble(5))
  }

  test("text_perplexity_bigram: one score per multi-token doc, bigram counts exact") {
    val out = operators.TextAnalysis.textPerplexityBigram(spark, sf).collect()
    val lens = Tables.documents(spark, sf)
      .selectExpr("doc_id", "size(split(text, '\\\\s+')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val eligible = lens.filter(_._2 >= 2).keySet
    assert(out.map(_.getLong(0)).toSet == eligible, "docs with >= 2 tokens score")
    // a doc's bigram total is exactly n_tokens - 1
    assert(out.forall(r => r.getLong(1) == lens(r.getLong(0)) - 1L))
    assert(out.forall(_.getDouble(3) > 0), "perplexity is positive")
  }

  test("table_diff: classifies exactly the synthetic deletes, updates, and inserts") {
    val o = Tables.orders(spark, sf).select("o_orderkey")
    val keys = o.collect().map(_.getLong(0)).toSet
    val out = operators.Quality.tableDiff(spark, sf).collect()
      .groupBy(_.getString(1)).map { case (t, rs) => t -> rs.map(_.getLong(0)).toSet }
    assert(out("delete") == keys.filter(_ % 97 == 0))
    // keys divisible by both 100 and 97 are deletes, not updates
    assert(out("update") == keys.filter(k => k % 100 == 0 && k % 97 != 0))
    assert(out("insert") == keys.filter(_ % 101 == 0).map(_ + 10000000L))
    // payload sanity: deletes carry no new value, inserts no old one
    val rows = operators.Quality.tableDiff(spark, sf).collect()
    assert(rows.filter(_.getString(1) == "delete").forall(_.isNullAt(3)))
    assert(rows.filter(_.getString(1) == "insert").forall(_.isNullAt(2)))
  }

  test("embed_top_pc: unit-norm dominant direction explaining more than an average axis") {
    val rows = operators.Similarity.embedTopPc(spark, sf).collect()
    assert(rows.length == 64)
    val loadings = rows.map(_.getDouble(1))
    val norm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"loadings are unit-norm, got $norm")
    val share = rows.head.getDouble(2)
    assert(rows.forall(_.getDouble(2) == share), "variance share is one corpus scalar")
    assert(share > 0 && share <= 1.0)
    assert(share > 1.0 / 64,
      s"the TOP component must explain more than an average axis: $share")
  }

  test("events_key_skew: one-row report with consistent distribution stats") {
    val r = operators.Events.eventsKeySkew(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (nKeys, nRows) = (row.getLong(0), row.getLong(1))
    val (maxShare, top10Share, entropy, skewRatio) =
      (row.getDouble(2), row.getDouble(3), row.getDouble(4), row.getDouble(5))
    assert(nKeys > 0 && nRows >= nKeys)
    assert(maxShare > 0 && maxShare <= top10Share && top10Share <= 1.0)
    // uniform distribution maximizes entropy at ln(n_keys)
    assert(entropy > 0 && entropy <= math.log(nKeys.toDouble) + 1e-6)
    assert(skewRatio >= 1.0 - 1e-6, "hottest key is at least average")
  }

  test("retrieve_chunks_bm25: top-3 corpus chunks per query, ranked") {
    val out = operators.Matching.retrieveChunksBm25(spark, sf).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty && byQuery.keySet.subsetOf(Set(0L, 1L, 2L)))
    for ((_, rows) <- byQuery) {
      assert(rows.length <= 3)
      assert(rows.map(_.getInt(4)).sorted.toSeq == (1 to rows.length))
      // retrieved passages come from the corpus half, never a query doc
      assert(rows.forall(_.getLong(1) >= 3))
      // ranks follow descending score
      val scores = rows.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("knn_pq_adc: ADC top-10 approximates the exact-L2 top-10") {
    val out = operators.Similarity.knnPqAdc(spark, sf).cache()
    val rows = out.collect()
    assert(rows.length == 10)
    // rank orders the ADC distance ascending
    val byRank = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("adc_d2"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    // recall vs the exact L2 top-10 — the quantity PQ trades for 32x
    // compression. Value equality is pinned by the DuckDB oracle;
    // this is a sanity floor (measured per-dataset: 0.4 at sf0.001,
    // 0.8 at sf0.01, 0.5 at sf0.1 — random embeddings are PQ's worst
    // case, real clustered corpora sit far higher)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val q = e.find(_._1 == 0L).get._2
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = e.filter(_._1 != 0L).sortBy(p => (d2(p._2, q), p._1))
      .take(10).map(_._1).toSet
    val got = rows.map(_.getAs[Long]("vec_id")).toSet
    val recall = got.intersect(exact).size / 10.0
    assert(recall >= 0.3, s"PQ recall@10 = $recall, exact=$exact got=$got")
    out.unpersist()
  }

  test("sample_epoch_expand: row count is exactly sum of docs x epochs") {
    val out = operators.Sampling.sampleEpochExpand(spark, sf).cache()
    val plan = operators.Sampling.sampleMixtureEpochs(spark, sf)
      .select("source", "epochs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docsPerSource = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = docsPerSource.map { case (src, n) => n * plan(src) }.sum
    assert(out.count() == expect)
    // per-doc epoch indexes are dense 1..epochs
    assert(out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("epoch_idx").as("mx"))
      .filter(col("n") =!= col("mx")).count() == 0)
    out.unpersist()
  }

  test("events_new_vs_returning: day-0 is all-new and totals reconcile with DAU") {
    val rows = operators.Events.eventsNewVsReturning(spark, sf).collect()
      .sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Long]("returning_users") == 0,
      "the first day has no returning users")
    assert(rows.forall(r => r.getAs[Long]("dau") ==
      r.getAs[Long]("new_users") + r.getAs[Long]("returning_users")))
    // every user is new exactly once
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("new_users")).sum == users)
  }

  test("embed_top2_pc: near-orthogonal components, pc1 matches embed_top_pc") {
    val out = operators.Similarity.embedTop2Pc(spark, sf).collect()
    assert(out.length == 128)
    def comp(k: Long): Array[Double] = out.filter(_.getAs[Long]("component") == k)
      .sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("loading"))
    val (p1, p2) = (comp(1), comp(2))
    // both unit-ish (round-6 loadings)
    def n2(v: Array[Double]) = v.map(x => x * x).sum
    assert(math.abs(n2(p1) - 1.0) < 1e-3 && math.abs(n2(p2) - 1.0) < 1e-3)
    // deflation makes the second direction near-orthogonal to the first
    val dot = p1.zip(p2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 0.05, s"|pc1 . pc2| = ${math.abs(dot)}")
    // component 1 is exactly the single-component operator's output
    val single = operators.Similarity.embedTopPc(spark, sf).collect()
      .sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("loading"))
    assert(p1.sameElements(single))
    // explained variance: pc1's share >= pc2's share
    def share(k: Long) = out.find(_.getAs[Long]("component") == k).get
      .getAs[Double]("var_share")
    assert(share(1) >= share(2) && share(2) > 0)
  }

  test("match_blocking_eval: recall consistent with the blocked matcher's candidates") {
    val row = operators.Matching.matchBlockingEval(spark, sf).head()
    val nTrue = row.getAs[Long]("n_true_pairs")
    val inBlock = row.getAs[Long]("n_true_in_block")
    assert(nTrue > 0 && inBlock <= nTrue)
    assert(row.getAs[Double]("recall") ==
      BigDecimal(inBlock.toDouble / nTrue)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the blocked candidate volume equals the exploded multi-pass
    // key-stream join rows: Σ_k |c@k|·|s@k| over the tagged
    // prefix-2 ∪ suffix-4 keys of the normalized name (a pair both
    // passes admit is paid once per pass, as the join emits it)
    def norm(x: String): String =
      x.trim.toLowerCase.split("\\s+").sorted.mkString(" ")
    def keys(x: String): Seq[String] =
      Seq("p:" + norm(x).take(2), "s:" + norm(x).takeRight(4))
    val c = Tables.customer(spark, sf).select("c_name").collect()
      .flatMap(r => keys(r.getString(0))).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val s = Tables.supplier(spark, sf).select("s_name").collect()
      .flatMap(r => keys(r.getString(0))).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val vol = c.keySet.intersect(s.keySet).toSeq.map(k => c(k) * s(k)).sum
    assert(row.getAs[Long]("n_blocked_candidates") == vol)
    // distinct admitted pairs subtract the dual-pass overlap (counted
    // via combined (prefix2, suffix4) key collisions — the unit the
    // downstream argmax actually scores)
    def combo(x: String): (String, String) =
      (norm(x).take(2), norm(x).takeRight(4))
    val cc = Tables.customer(spark, sf).select("c_name").collect()
      .map(r => combo(r.getString(0))).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val sc = Tables.supplier(spark, sf).select("s_name").collect()
      .map(r => combo(r.getString(0))).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val both = cc.keySet.intersect(sc.keySet).toSeq.map(k => cc(k) * sc(k)).sum
    assert(row.getAs[Long]("n_blocked_pairs_distinct") == vol - both)
    assert(row.getAs[Long]("n_blocked_pairs_distinct") <=
      row.getAs[Long]("n_blocked_candidates"))
  }

  test("dedup_minhash_est_eval: estimator covers the verify set and errors are bounded") {
    val out = operators.Dedup.dedupMinhashEstEval(spark, sf).cache()
    val verified = operators.Dedup.dedupMinhashLsh(spark, sf).count()
    assert(out.count() >= verified,
      "eval covers every candidate pair, verify only the >= 0.8 subset")
    // est is k/8-quantized; exact in [0,1]; |err| bounded by 1
    assert(out.filter(col("est_jaccard") * 8 =!=
      round(col("est_jaccard") * 8, 0)).count() == 0)
    assert(out.filter(col("exact_jaccard") < 0 || col("exact_jaccard") > 1).count() == 0)
    // the estimator is USEFUL on this corpus: mean abs error under 0.25
    val mae = out.agg(avg("abs_err")).head().getDouble(0)
    assert(mae < 0.25, s"mean abs error $mae")
    out.unpersist()
  }

  test("embed_outliers: ranked by |z| with a correct per-label z on a spot row") {
    val out = operators.Similarity.embedOutliers(spark, sf).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length == 20)
    val zs = out.map(r => math.abs(r.getAs[Double]("z")))
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b }, "ranked by |z| desc")
    // spot-check one row against a local recomputation
    val top = out.head
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val lbl = top.getAs[Number]("label").longValue
    val members = e.filter(_._2 == lbl)
    val dims = members.head._3.length
    val cent = (0 until dims).map(i => members.map(_._3(i)).sum / members.length)
    def dist(v: Array[Double]) =
      math.sqrt(v.zip(cent).map { case (a, c) => (a - c) * (a - c) }.sum)
    val ds = members.map(m => dist(m._3))
    val mu = ds.sum / ds.length
    val sd = math.sqrt(ds.map(d => d * d).sum / ds.length - mu * mu)
    val dTop = dist(members.find(_._1 == top.getAs[Long]("vec_id")).get._3)
    val zExpect = BigDecimal((dTop - mu) / sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(top.getAs[Double]("z") - zExpect) < 1e-6,
      s"${top.getAs[Double]("z")} vs $zExpect")
  }

  test("bpe_train_rounds: symbol count shrinks by exactly the merged-pair count each round") {
    val rows = operators.TextAnalysis.bpeTrainRounds(spark, sf).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.length == 3)
    val startSymbols = Tables.documents(spark, sf)
      .select(size(split(col("text"), "\\s+")).as("n")).filter(col("n") >= 2)
      .agg(sum("n")).head().getLong(0)
    // every merge of a non-overlapping (a≠b) pair removes one symbol
    // per occurrence — the count column IS the shrink
    var before = startSymbols
    rows.foreach { r =>
      assert(r.getAs[Long]("corpus_symbols") == before - r.getAs[Long]("pair_count"),
        s"round ${r.getAs[Long]("round")}: $before - ${r.getAs[Long]("pair_count")}")
      before = r.getAs[Long]("corpus_symbols")
    }
    // elected counts never increase round over round (the best pair
    // was already the max; merging can only reduce adjacency counts
    // of OTHER pairs or create new '@@' symbols with fresh counts)
    val pairs = rows.map(_.getAs[String]("merged_pair"))
    assert(pairs.distinct.length == 3, s"rules must differ: ${pairs.toSeq}")
  }

  test("sample_mixture_epochs: epochs bounded, largest source stays at 1 epoch") {
    val rows = operators.Sampling.sampleMixtureEpochs(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("epochs") >= 1L
      && r.getAs[Long]("epochs") <= 4L))
    val biggest = rows.maxBy(_.getAs[Long]("n_tokens"))
    assert(biggest.getAs[Long]("epochs") == 1L, "the target source never repeats")
    rows.foreach { r =>
      assert(r.getAs[Long]("effective_tokens") ==
        r.getAs[Long]("n_tokens") * r.getAs[Long]("epochs"))
    }
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-3, s"shares sum to $shares")
  }

  test("knn_filtered: pre-filter keeps exact top-k semantics under the predicate") {
    val out = operators.Similarity.knnFiltered(spark, sf).collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getAs[Number]("label").longValue == 3L),
      "every hit satisfies the filter")
    // equals a local exact filtered top-5
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val q = e.find(_._1 == 0L).get._3
    val qn = math.sqrt(q.map(x => x * x).sum)
    def cos(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      BigDecimal(v.zip(q).map { case (a, b) => a * b }.sum / (n * qn))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = e.filter(p => p._2 == 3L && p._1 != 0L)
      .map(p => (cos(p._3), p._1)).sortBy(p => (-p._1, p._2)).take(5).map(_._2)
    assert(out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq
      == expect.toSeq)
  }

  test("knn_batch_ivf: per-query hits come only from that query's probed cells") {
    val out = operators.Similarity.knnBatchIvf(spark, sf).cache()
    val qs = out.select("q_id").distinct().count()
    assert(qs == 8, "every batch query answers")
    assert(out.groupBy("q_id").count().filter(col("count") =!= 3).count() == 0)
    // each query's results sit in at most 2 labels (its nprobe cells)
    assert(out.groupBy("q_id").agg(countDistinct("label").as("c"))
      .filter(col("c") > 2).count() == 0)
    out.unpersist()
  }

  test("embed_whitening: whitened dims have ~zero mean and ~unit variance corpus-wide") {
    // recompute the whitening over ALL vectors (the emitted slice is
    // the first 10 ids; stats are corpus-wide so verify against corpus)
    val px = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
          .as(Seq("pos", "x")))
    val stats = px.groupBy("pos").agg(
      (sum("x") / count(lit(1))).as("mu"),
      sqrt((sum(col("x") * col("x")) / count(lit(1))) -
        (sum("x") / count(lit(1))) * (sum("x") / count(lit(1)))).as("sd"))
    val white = px.join(stats, "pos")
      .select(col("pos"), ((col("x") - col("mu")) / col("sd")).as("w"))
      .groupBy("pos").agg(
        abs(sum("w") / count(lit(1))).as("m"),
        abs(sum(col("w") * col("w")) / count(lit(1)) - 1.0).as("v1"))
    assert(white.filter(col("m") > 1e-9 || col("v1") > 1e-9).count() == 0)
    // emitted slice agrees with the closed form on a spot row
    val row = operators.Similarity.embedWhitening(spark, sf)
      .filter(col("vec_id") === 1 && col("pos") === 0).head()
    val st = stats.filter(col("pos") === 0).head()
    val x = Tables.embeddings(spark, sf).filter(col("vec_id") === 1)
      .select(expr("CAST(embedding[0] AS DOUBLE)")).head().getDouble(0)
    val expect = BigDecimal((x - st.getAs[Double]("mu")) / st.getAs[Double]("sd"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("white") - expect) < 1e-9)
  }

  test("dedup_method_agreement: combination counts reconcile with the per-method totals") {
    val out = operators.Dedup.dedupMethodAgreement(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    def methodTotal(flag: String): Long =
      rows.filter(_.getAs[Long](flag) == 1L).map(_.getAs[Long]("n_pairs")).sum
    // each method's marginal equals its own pair count
    assert(methodTotal("f_minhash") ==
      operators.Dedup.dedupMinhashLsh(spark, sf).count())
    assert(methodTotal("f_ngram") ==
      operators.Dedup.dedupNgramJaccard(spark, sf).count())
    assert(methodTotal("f_simhash") ==
      operators.Dedup.dedupSimhash(spark, sf).count())
    // no all-zero combination can exist (every pair came from a method)
    assert(rows.forall(r => Seq("f_exact", "f_minhash", "f_ngram", "f_simhash")
      .map(r.getAs[Long](_)).sum >= 1L))
    out.unpersist()
  }

  test("dedup_threshold_sweep: cumulative curve is consistent with the 0.8 dedup gate") {
    val sweep = operators.Dedup.dedupThresholdSweep(spark, sf).cache()
    val rows = sweep.collect()
    assert(rows.nonEmpty, "sf test corpus has near-dup pairs above 0.5")
    // cumulative count is nonincreasing as the threshold bin rises
    val byBin = rows.sortBy(_.getAs[Long]("bin_x10"))
      .map(r => (r.getAs[Long]("bin_x10"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_pairs_at_or_above")))
    assert(byBin.zip(byBin.tail).forall { case ((_, _, c1), (_, _, c2)) => c1 >= c2 },
      s"cumulative must shrink with threshold: ${byBin.mkString(",")}")
    // per-bin counts sum to the >= 0.5 cumulative (lowest bin present)
    assert(byBin.map(_._2).sum == byBin.head._3,
      "sum of bins equals the cumulative at the lowest bin")
    // the curve's >= 0.8 point IS what dedup_ngram_jaccard flags
    val at08 = byBin.filter(_._1 >= 8L).map(_._2).sum
    val flagged = operators.Dedup.dedupNgramJaccard(spark, sf).count()
    assert(at08 == flagged,
      s"sweep at 0.8 ($at08) must equal the ngram-jaccard gate count ($flagged)")
    sweep.unpersist()
  }

  test("text_perplexity_kn: the smoothed model is a proper conditional distribution") {
    val out = operators.TextAnalysis.textPerplexityKn(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("ppl") <= 0 || col("avg_nll") < 0).count() == 0,
      "perplexity positive, mean NLL non-negative (p <= 1 everywhere)")
    // rebuild the model locally and check Σ_w2 p(w2|w1) = 1 over the
    // full continuation vocabulary — the defining property absolute
    // discounting + continuation mass must preserve
    val bg = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t)-1), i -> struct(element_at(t, i) AS w1, element_at(t, i+1) AS w2))"))
        .as("b"))
      .groupBy("b.w1", "b.w2").agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val c1 = bg.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1f = bg.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size }
    val n1b = bg.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size }
    val tTypes = bg.size.toDouble
    val vocab = n1b.keys.toSeq
    val d = 0.75
    c1.keys.take(20).foreach { w1 =>
      val total = vocab.map { w2 =>
        val disc = bg.get((w1, w2))
          .map(c => (c - d) / c1(w1)).getOrElse(0.0)
        disc + d * n1f(w1) / c1(w1) * (n1b(w2) / tTypes)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9,
        s"Σ p(w2|'$w1') = $total must be 1")
    }
    out.unpersist()
  }

  test("text_ngram_novelty: agrees with a local df computation") {
    val out = operators.Dedup.textNgramNovelty(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val gramSets = docs.map { case (id, text) =>
      val t = text.split("\\s+")
      id -> (if (t.length < 5) Set.empty[String]
        else (0 to t.length - 5).map(i => t.slice(i, i + 5).mkString(" ")).toSet)
    }.filter(_._2.nonEmpty)
    val df = gramSets.flatMap(_._2).groupBy(identity).map { case (g, v) => g -> v.size }
    assert(out.keySet == gramSets.map(_._1).toSet,
      "every >=5-token doc gets a profile row")
    gramSets.foreach { case (id, gs) =>
      val (n, nov, com) = out(id)
      assert(n == gs.size.toLong)
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(nov == r6(gs.count(df(_) == 1).toDouble / gs.size), s"doc $id novelty")
      assert(com == r6(gs.count(df(_) >= 3).toDouble / gs.size), s"doc $id common")
    }
    // the corpus exercises both ends of the signal (df>=5 grams only
    // appear at the bigger SFs — the sf0.01/0.1 oracle gates cover
    // common_frac > 0; here: high-novelty docs AND shared grams)
    assert(out.values.exists(_._2 > 0.5) && out.values.exists(_._2 < 1.0))
  }

  test("text_zipf_fit: agrees with a local least-squares over the top-100 counts") {
    val row = operators.TextAnalysis.textZipfFit(spark, sf).head()
    // independent local fit from raw token counts
    val counts = Tables.documents(spark, sf)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val top = counts.sortBy { case (w, c) => (-c, w) }.take(100)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getAs[Long]("n_terms") == top.length.toLong)
    assert(math.abs(row.getAs[Double]("slope") - slope) < 1e-4,
      s"slope ${row.getAs[Double]("slope")} vs local $slope")
    // natural-language shape: frequencies decay with rank, fit is real
    assert(row.getAs[Double]("slope") < 0)
    val r2 = row.getAs[Double]("r2")
    assert(r2 > 0 && r2 <= 1.0, s"r2 $r2")
  }
}
