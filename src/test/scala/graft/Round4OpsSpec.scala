package graft

import org.apache.spark.sql.functions._

/** Invariant specs for the round-4 operator batch (PII scrub, token
  * entropy, CMS heavy hitters, pivot, Q4 semi-join, event paths, URL
  * canonicalization, hash split). Value parity vs DuckDB is covered
  * by Verify + check_oracle; these pin the semantic invariants that a
  * hash match alone would not explain.
  */
class Round4OpsSpec extends SparkSpec {

  test("text_pii_scrub detects every synthesized PII planting") {
    val out = operators.TextAnalysis.textPiiScrub(spark, sf).cache()
    // every doc_id % 4 == 0 row had an email appended, so >= 1 hit
    assert(out.filter(col("doc_id") % 4 === 0 && col("n_emails") < 1).count() == 0)
    assert(out.filter(col("doc_id") % 6 === 0 && col("n_phones") < 1).count() == 0)
    assert(out.filter(col("doc_id") % 10 === 0 && col("n_ips") < 1).count() == 0)
    // the synthetic corpus itself carries no PII
    assert(out.filter(col("doc_id") % 4 =!= 0 && col("n_emails") > 0).count() == 0)
    out.unpersist()
  }

  test("text_token_entropy stays within [0, ln(n_distinct)]") {
    val out = operators.TextAnalysis.textTokenEntropy(spark, sf).cache()
    assert(out.filter(col("entropy") < -1e-9).count() == 0)
    // norm_entropy = H / ln(n_distinct) <= 1 (+ rounding slack)
    assert(out.filter(col("norm_entropy") > 1.000001).count() == 0)
    assert(out.filter(col("n_distinct") > col("n_tokens")).count() == 0)
    out.unpersist()
  }

  test("heavy_hitters_cms estimate never under-counts") {
    val out = operators.Sketches.heavyHittersCms(spark, sf).cache()
    assert(out.count() == 20)
    // CMS collisions only ADD mass: min-over-rows >= true count
    assert(out.filter(col("cms_est") < col("n_exact")).count() == 0)
    out.unpersist()
  }

  test("pivot_agg columns partition the orders table") {
    val out = operators.Olap.pivotAgg(spark, sf)
    val total = out.agg(sum("n_total")).head.getLong(0)
    assert(total == Tables.orders(spark, sf).count())
    assert(out.filter(
      col("n_total") =!= col("n_open") + col("n_finished") + col("n_pending"))
      .count() == 0)
  }

  test("q4_priority_exists counts each qualifying order once") {
    val out = operators.Olap.q4PriorityExists(spark, sf)
    val expected = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf).filter(col("l_discount") > 0.05)
          .select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(out.agg(sum("n_orders")).head.getLong(0) == expected)
  }

  test("events_path_transitions probabilities sum to 1 per source") {
    val out = operators.Events.eventsPathTransitions(spark, sf)
    val sums = out.groupBy("from_type").agg(sum("p").as("psum"))
    // rounding at 6dp: each from_type's outgoing mass is 1 ± |types|*5e-7
    assert(sums.filter(abs(col("psum") - 1.0) > 1e-4).count() == 0)
  }

  test("clean_url_canon collapses all three crawl variants") {
    val out = operators.Cleaning.cleanUrlCanon(spark, sf).cache()
    // each part contributes 3 variants that MUST land on one key
    assert(out.filter(col("n_variants") % 3 =!= 0).count() == 0)
    val bad = out.filter(
      col("canon_url").rlike("[A-Z]") ||
        col("canon_url").contains("utm_") ||
        col("canon_url").contains("#") ||
        col("canon_url").contains(":443") ||
        col("canon_url").endsWith("/"))
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("q14_promo_share ratio stays a share of its own month") {
    val out = operators.Olap.q14PromoShare(spark, sf)
    assert(out.filter(col("promo_share") < 0 || col("promo_share") > 1).count() == 0)
    assert(out.filter(col("promo_rev") > col("total_rev")).count() == 0)
  }

  test("q15_top_supplier rows all carry the one maximal revenue") {
    val out = operators.Olap.q15TopSupplier(spark, sf)
    assert(out.select("total_rev").distinct().count() == 1)
    assert(out.count() >= 1)
  }

  test("q18_large_orders only emits orders over the threshold") {
    val out = operators.Olap.q18LargeOrders(spark, sf)
    assert(out.filter(col("sum_qty") <= 300.0).count() == 0)
  }

  test("q19_disjunctive returns one aggregate row") {
    assert(operators.Olap.q19Disjunctive(spark, sf).count() == 1)
  }

  test("orders_rfm covers every customer with a 3-letter segment") {
    val out = operators.Olap.ordersRfm(spark, sf).cache()
    val customers = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(out.count() == customers)
    assert(out.filter(!col("segment").rlike("^[HL]{3}$")).count() == 0)
    out.unpersist()
  }

  test("text_keywords_tfidf keeps at most 3 keywords per doc") {
    val out = operators.TextAnalysis.textKeywordsTfidf(spark, sf).cache()
    val maxPer = out.groupBy("doc_id").count().agg(max("count")).head.getLong(0)
    assert(maxPer <= 3)
    assert(out.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
    out.unpersist()
  }

  test("events_sliding_dau dominates the single-day DAU") {
    val daily = Tables.events(spark, sf)
      .select(expr("ts_s div 86400").as("day"), col("user_id"))
      .groupBy("day").agg(countDistinct("user_id").as("dau1"))
    val out = operators.Events.eventsSlidingDau(spark, sf)
    // day d's 7-day window [d-6, d] contains day d itself
    assert(out.join(daily, "day").filter(col("dau7") < col("dau1")).count() == 0)
  }

  test("embed_label_stats centroid norm obeys the triangle inequality") {
    val out = operators.Similarity.embedLabelStats(spark, sf).cache()
    assert(out.count() == 10)
    // ||mean(x)|| <= mean(||x||), with 6dp rounding slack
    assert(out.filter(col("centroid_norm") > col("mean_norm") + 1e-5).count() == 0)
    out.unpersist()
  }

  test("graph_pagerank emits a positive, rank-ordered top-20") {
    val out = operators.Graph.graphPagerank(spark, sf).cache()
    assert(out.count() == 20)
    assert(out.filter(col("pagerank") <= 0).count() == 0)
    val ranks = out.orderBy("rank").select("pagerank")
      .collect().map(_.getDouble(0))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    out.unpersist()
  }

  test("grouping_sets_agg grains agree on the grand total") {
    val out = operators.Olap.groupingSetsAgg(spark, sf).cache()
    // four grains: 0 = (rf, prio), 1 = rf-only, 2 = prio-only, 3 = total
    assert(out.select("gid").distinct().count() == 4)
    val byGid = out.groupBy("gid").agg(sum("n_lines").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byGid.values.toSet.size == 1, s"grain totals disagree: $byGid")
    out.unpersist()
  }

  test("part_affinity statistics obey their definitional bounds") {
    val out = operators.Graph.partAffinity(spark, sf).cache()
    assert(out.count() <= 20)
    assert(out.filter(col("confidence") > 1.0 || col("confidence") <= 0).count() == 0)
    // support = n_ab/N <= n_ab/n_a = confidence, since n_a <= N
    assert(out.filter(col("support") > col("confidence")).count() == 0)
    assert(out.filter(col("lift") <= 0).count() == 0)
    assert(out.filter(col("n_ab") < 5).count() == 0)
    out.unpersist()
  }

  test("approx_quantiles_sampled: ~10% sample, monotone percentiles") {
    val out = operators.Sketches.approxQuantilesSampled(spark, sf).cache()
    val total = Tables.events(spark, sf).count()
    val sampled = out.agg(sum("n_sample")).head.getLong(0)
    val frac = sampled.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"sample fraction $frac")
    assert(out.filter(col("p50_exact") > col("p90_exact") ||
      col("p90_exact") > col("p99_exact")).count() == 0)
    assert(out.filter(col("p50_est") > col("p90_est")).count() == 0)
    out.unpersist()
  }

  test("orders_scd2 versions partition each customer's timeline") {
    val out = operators.Olap.ordersScd2(spark, sf).cache()
    assert(out.count() == Tables.orders(spark, sf).count())
    // exactly one open (is_current) version per customer
    val multi = out.filter(col("is_current") === 1)
      .groupBy("o_custkey").count().filter(col("count") =!= 1).count()
    assert(multi == 0)
    // versions are contiguous 1..n per customer
    val vstats = out.groupBy("o_custkey")
      .agg(min("version").as("vmin"), max("version").as("vmax"),
        count(lit(1)).as("n"))
    assert(vstats.filter(col("vmin") =!= 1 || col("vmax") =!= col("n")).count() == 0)
    out.unpersist()
  }

  test("events_gap_fill densifies every type's timeline, fill carries forward") {
    val out = operators.Events.eventsGapFill(spark, sf).cache()
    // a dense grid: per type, rows == span of hours
    val spans = out.groupBy("event_type")
      .agg(min("hour").as("h0"), max("hour").as("h1"), count(lit(1)).as("n"))
    assert(spans.filter(col("n") =!= col("h1") - col("h0") + 1).count() == 0)
    // gap rows observe nothing but inherit a positive filled count
    assert(out.filter(col("is_gap") === 1 &&
      (col("n_observed") =!= 0 || col("n_filled") <= 0)).count() == 0)
    // observed rows: filled IS the observation
    assert(out.filter(col("is_gap") === 0 &&
      col("n_observed") =!= col("n_filled")).count() == 0)
    out.unpersist()
  }

  test("customer_pareto deciles partition customers, shares telescope") {
    val out = operators.Olap.customerPareto(spark, sf).cache()
    val customers = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(out.agg(sum("n_customers")).head.getLong(0) == customers)
    val shareSum = out.agg(sum("rev_share")).head.getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    // cumulative-from-top decreases as the decile index rises toward the top
    val cums = out.orderBy("decile").select("cum_share_from_top")
      .collect().map(_.getDouble(0))
    assert(cums.zip(cums.tail).forall { case (lo, hi) => lo >= hi - 1e-9 })
    out.unpersist()
  }

  test("pack_sequences: contiguous offsets per shard, bin = offset div budget") {
    val out = operators.Sampling.packSequences(spark, sf).cache()
    assert(out.count() == Tables.documents(spark, sf).count())
    // each doc starts exactly where its shard predecessor ended
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "shard").orderBy("doc_id")
    val gaps = out.withColumn("prev_end",
        lag(col("start_offset") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("start_offset") =!= col("prev_end"))
    assert(gaps.count() == 0)
    assert(out.filter(col("bin") =!= (col("start_offset") / 2048).cast("long"))
      .count() == 0)
    out.unpersist()
  }

  test("q7_volume: symmetric nation pairs, no self-pairs") {
    val out = operators.Olap.q7Volume(spark, sf).cache()
    assert(out.filter(col("supp_nation") === col("cust_nation")).count() == 0)
    // both directions of the pair appear (trade is bilateral in the data)
    val pairs = out.select("supp_nation", "cust_nation").distinct().count()
    assert(pairs == 2)
    assert(out.filter(col("l_year") < 1996 || col("l_year") > 1997).count() == 0)
    out.unpersist()
  }

  test("q21_sole_supplier: one-pass aggregate equals the self-join form") {
    val l = Tables.lineitem(spark, sf)
    val late = l.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_suppkey").distinct()
    val multi = l.groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("ns")).filter(col("ns") > 1)
      .select("l_orderkey")
    val soleLate = late.groupBy("l_orderkey")
      .agg(count(lit(1)).as("nl"), max("l_suppkey").as("sk"))
      .filter(col("nl") === 1)
    val expected = soleLate.join(multi, "l_orderkey")
      .groupBy("sk").agg(count(lit(1)).as("waiting"))
    val out = operators.Olap.q21SoleSupplier(spark, sf)
      .join(Tables.supplier(spark, sf), "s_name")
      .select(col("s_suppkey").as("sk"), col("waiting"))
    assert(out.join(expected, Seq("sk", "waiting"), "left_anti").count() == 0)
  }

  test("q22_idle_balance picks only above-average, inactive customers") {
    val out = operators.Olap.q22IdleBalance(spark, sf)
    val cutoff = lit("2000-01-01").cast("timestamp")
    val pos = Tables.customer(spark, sf).filter(col("c_acctbal") > 0)
    val avgBal = pos.agg(avg("c_acctbal")).head.getDouble(0)
    val active = Tables.orders(spark, sf).filter(col("o_orderdate") >= cutoff)
      .select("o_custkey").distinct()
    val expected = pos.filter(col("c_acctbal") > avgBal)
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(out.agg(sum("n_cust")).head.getLong(0) == expected)
  }

  test("sample_temperature boosts low-resource languages") {
    val out = operators.Sampling.sampleTemperature(spark, sf).cache()
    val natural = Tables.documents(spark, sf).groupBy("lang")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = out.select("lang", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // smaller languages must get a keep rate >= any larger language's
    val ordered = natural.toSeq.sortBy(_._2).map(_._1).filter(rates.contains)
    ordered.sliding(2).foreach {
      case Seq(small, big) => assert(rates(small) >= rates(big) - 1e-9)
      case _ =>
    }
    assert(out.filter(col("u") >= col("keep_rate")).count() == 0)
    out.unpersist()
  }

  test("chunk_overlap covers every token with stride-48 windows") {
    val out = operators.TextAnalysis.chunkOverlap(spark, sf).cache()
    // every doc chunks; chunk 0 always starts at 0
    val docs = Tables.documents(spark, sf).count()
    assert(out.filter(col("chunk_id") === 0 && col("start_tok") === 0).count() == docs)
    // starts advance by exactly the stride and lengths never exceed size
    assert(out.filter(col("start_tok") =!= col("chunk_id").cast("long") * 48).count() == 0)
    assert(out.filter(col("n_tok") > 64 || col("n_tok") < 1).count() == 0)
    // consecutive chunks overlap by 16: next start < prior start + 64
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("chunk_id")
    val broken = out.withColumn("prev_start", lag("start_tok", 1).over(w))
      .filter(col("prev_start").isNotNull &&
        col("start_tok") >= col("prev_start") + 64)
    assert(broken.count() == 0)
    // the plan is shuffle-free up to the final presentation sort
    val p = operators.TextAnalysis.chunkOverlap(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
    out.unpersist()
  }

  test("sample_hash_split is exhaustive, typed, and roughly 80/10/10") {
    val docs = Tables.documents(spark, sf).count()
    val out = operators.Sampling.sampleHashSplit(spark, sf).cache()
    assert(out.count() == docs)
    val bys = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bys.keySet.subsetOf(Set("train", "val", "test")))
    // md5-uniform: train share within a wide tolerance at 500 docs
    assert(bys("train").toDouble / docs > 0.7 && bys("train").toDouble / docs < 0.9)
    out.unpersist()
  }

  test("doc_length_histogram: exhaustive power-of-2 buckets, shares sum to 1") {
    val docs = Tables.documents(spark, sf).count()
    val out = operators.TextAnalysis.docLengthHistogram(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs, "every doc in one bucket")
    assert(math.abs(out.map(_.getAs[Double]("doc_share")).sum - 1.0) < 1e-4)
    assert(math.abs(out.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-4)
    // bucket floor is the power of two, and buckets are distinct+sorted
    assert(out.forall(r =>
      r.getAs[Long]("min_tokens") == (1L << r.getAs[Int]("bucket"))))
    val buckets = out.map(_.getAs[Int]("bucket"))
    assert(buckets.toSeq == buckets.sorted.toSeq && buckets.distinct.length == buckets.length)
    // token mass per bucket is consistent with its doc population bounds
    assert(out.forall { r =>
      val lo = r.getAs[Long]("min_tokens"); val n = r.getAs[Long]("n_docs")
      val t = r.getAs[Long]("n_tokens")
      t >= lo * n && t < lo * 2 * n
    })
  }

  test("sample_shard_shuffle: deterministic shards, contiguous positions, decorrelated from split") {
    val docs = Tables.documents(spark, sf).count()
    val out = operators.Sampling.sampleShardShuffle(spark, sf).cache()
    assert(out.count() == docs, "every doc lands in exactly one shard slot")
    // positions are 1..|shard| with no gaps (a trainer can seek by offset)
    val shardStats = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(shardStats.forall(r =>
      r.getAs[Int]("lo") == 1 && r.getAs[Long]("n") == r.getAs[Int]("hi").toLong),
      "within-shard positions must be a contiguous 1..n ranking")
    // md5-uniform shard balance: no shard dominates (wide tolerance at 500 docs)
    assert(shardStats.map(_.getAs[Long]("n")).max < docs / 2)
    assert(out.select("shard").distinct().count() == 8)
    // re-running reproduces byte-identical shard assignments (no rand())
    val again = operators.Sampling.sampleShardShuffle(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(again == out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
    // the shuffle hash is salted: shard order must not mirror the
    // split hash's ordering (decorrelation pin — same u would make
    // per-shard order expose the train/val/test boundary structure)
    val joined = out.select(col("doc_id"), col("u").as("u_shuffle"))
      .join(operators.Sampling.sampleHashSplit(spark, sf)
        .select(col("doc_id"), col("u").as("u_split")), "doc_id")
    assert(joined.filter(col("u_shuffle") === col("u_split")).count() == 0,
      "shuffle and split hashes must differ (salted)")
    out.unpersist()
  }
}
