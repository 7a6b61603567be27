package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-8 operators: probabilistic record linkage, sorted-neighborhood
  * blocking, KMV set algebra, soft dedup, rater agreement, power
  * analysis, source divergence. Each test pins the operator against an
  * independent local recomputation (the oracle gate checks DuckDB
  * parity; these pin the SEMANTICS).
  */
class Round8OpsSpec extends SparkSpec {

  test("match_fellegi_sunter: patterns partition the block pairs; weights ordered by evidence") {
    val out = operators.Matching.matchFellegiSunter(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 8)
    // patterns partition the candidate set: total = DISTINCT pairs the
    // multi-pass name block admits (prefix-2 OR suffix-4 agreement on
    // the normalized names — the same block the fuzzy matcher runs)
    def norm(x: String): String =
      x.trim.toLowerCase.split("\\s+").sorted.mkString(" ")
    val cn = Tables.customer(spark, sf).select("c_name").collect()
      .map(r => norm(r.getString(0)))
    val sn = Tables.supplier(spark, sf).select("s_name").collect()
      .map(r => norm(r.getString(0)))
    val expectPairs = (for {
      a <- cn; b <- sn
      if a.take(2) == b.take(2) || a.takeRight(4) == b.takeRight(4)
    } yield 1L).sum
    assert(out.map(_.getAs[Long]("n_pairs")).sum == expectPairs)
    // more agreement never lowers the weight: flipping any γ from 0→1
    // adds ln(m/u) − ln((1−m)/(1−u)) > 0 for every field here
    val w = out.map(r => (r.getAs[Int]("g_name"), r.getAs[Int]("g_bkt"),
      r.getAs[Int]("g_dig")) -> r.getAs[Double]("weight")).toMap
    for (((gn, gb, gd), wt) <- w) {
      if (gn == 0 && w.contains((1, gb, gd))) assert(w((1, gb, gd)) > wt)
      if (gb == 0 && w.contains((gn, 1, gd))) assert(w((gn, 1, gd)) > wt)
      if (gd == 0 && w.contains((gn, gb, 1))) assert(w((gn, gb, 1)) > wt)
    }
    // the name field dominates: any name-agree pattern outweighs any
    // name-disagree pattern (the noise fields' weights are near zero).
    // Under the multi-pass NAME block the admitted pairs may ALL agree
    // on the name γ at tiny SFs (suffix-matched templated names clear
    // the 0.5 similarity bar), so the disagree side is compared only
    // when present — the agree side must always exist.
    val minAgree = w.collect { case ((1, _, _), v) => v }.min
    w.collect { case ((0, _, _), v) => v }.maxOption.foreach { maxDisagree =>
      assert(minAgree > maxDisagree + 3.0)
    }
    // verdict thresholds applied on the emitted weight
    out.foreach { r =>
      val v = r.getAs[String]("verdict"); val wt = r.getAs[Double]("weight")
      if (wt >= math.log(8.0)) assert(v == "match")
      else if (wt <= -math.log(8.0)) assert(v == "non_match")
      else assert(v == "possible")
    }
  }

  test("match_sorted_neighborhood: equals the definitional rank-band join") {
    val out = operators.Matching.matchSortedNeighborhood(spark, sf)
    // definitional recomputation: full inequality join on ranks
    val p = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_name"),
        operators.Matching.normName(col("p_name")).as("norm"))
      .withColumn("pfx", substring(col("norm"), 1, 1))
    val ranked = p.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("pfx").orderBy("norm", "p_partkey")).cast("long"))
    val l = ranked.select(col("p_partkey").as("l_key"), col("norm").as("l_norm"),
      col("pfx"), col("rank").as("l_rank"))
    val r = ranked.select(col("p_partkey").as("r_key"), col("p_name").as("r_name"),
      col("norm").as("r_norm"), col("pfx"), col("rank").as("r_rank"))
    val ref = l.join(r, Seq("pfx"))
      .filter(col("r_rank") - col("l_rank") > 0 && col("r_rank") - col("l_rank") <= 4)
      .filter(col("l_key") % 2 === 0 && col("r_key") % 2 === 1)
      .withColumn("score", round(
        lit(1.0) - levenshtein(col("l_norm"), col("r_norm")).cast("double") /
          greatest(length(col("l_norm")), length(col("r_norm"))), 6))
      .filter(col("score") >= 0.5)
      .groupBy("l_key")
      .agg(max(struct(col("score"), (-col("r_key")).as("nk"), col("r_name"))).as("m"))
      .select(col("l_key"), (-col("m.nk")).as("r_key"),
        col("m.r_name").as("r_name"), col("m.score").as("score"))
    assert(out.count() > 0)
    assert(out.exceptAll(ref).count() == 0 && ref.exceptAll(out).count() == 0)
  }

  test("approx_set_overlap_kmv: estimator invariants and exact columns") {
    val out = operators.Sketches.approxSetOverlapKmv(spark, sf).collect()
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(out.length == langs * (langs - 1) / 2)
    // exact columns match an independent local shingle-set recompute
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sets = docs.groupBy(_._1).map { case (t, xs) =>
      t -> xs.flatMap { case (_, text) =>
        val w = text.split("\\s+")
        if (w.length < 3) Seq.empty
        else (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" "))
      }.toSet
    }
    out.foreach { r =>
      val a = sets(r.getAs[String]("t1")); val b = sets(r.getAs[String]("t2"))
      assert(r.getAs[Long]("n_a_exact") == a.size)
      assert(r.getAs[Long]("n_b_exact") == b.size)
      assert(r.getAs[Long]("inter_exact") == (a & b).size)
      val jex = (a & b).size.toDouble / (a | b).size
      assert(math.abs(r.getAs[Double]("jaccard_exact") - jex) < 1e-6)
      // k=64 sketch: s.e. of ĵ ≈ sqrt(j(1−j)/64) ≤ 0.063 — allow 4σ
      val j = r.getAs[Double]("jaccard_est")
      assert(j >= 0.0 && j <= 1.0)
      assert(math.abs(j - jex) < 0.25, s"jaccard_est $j vs exact $jex")
      // union estimate within 50% of truth at k=64 (s.e. ≈ 12.5%)
      val uex = (a | b).size.toDouble
      val ue = r.getAs[Double]("union_est")
      assert(ue > 0.5 * uex && ue < 1.5 * uex, s"union_est $ue vs $uex")
    }
  }

  test("sample_soft_dedup: per-family expected mass is one; singletons always kept") {
    val out = operators.Sampling.sampleSoftDedup(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(out.count() == n) // one verdict per document
    // singleton families: u < 1 always (u in [0,1)), so always kept
    assert(out.filter(col("n_family") === 1 && !col("keep")).count() == 0)
    // keep rule is exactly u·n < 1 on the emitted columns (rounded u
    // can disagree at the boundary only in the 7th decimal; recheck
    // against the unrounded rule via the family join)
    val agree = out.filter(
      (col("u") * col("n_family") < 1.0) =!= col("keep"))
    assert(agree.filter(abs(col("u") * col("n_family") - 1.0) > 1e-5).count() == 0)
    // expected survivors ≈ families (each family keeps Binomial(n,1/n),
    // mean 1); loose 3σ-style band
    val fams = out.select("family").distinct().count()
    val kept = out.filter(col("keep")).count()
    assert(math.abs(kept - fams) <= math.max(4L, fams / 2),
      s"kept $kept vs families $fams")
    out.unpersist()
  }

  test("quality_kappa: cells partition the corpus; kappa matches a local recomputation") {
    val Row(n: Long, n11: Long, n10: Long, n01: Long, n00: Long,
      po: Double, pe: Double, kappa: Double) =
      operators.Governance.qualityKappa(spark, sf).head
    assert(n == Tables.documents(spark, sf).count())
    assert(n11 + n10 + n01 + n00 == n)
    // independent local recomputation from the two signal queries
    val h = operators.TextAnalysis.textQuality(spark, sf)
      .select(col("doc_id"), (col("quality_bucket") === "ok").as("a")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val m = operators.TextAnalysis.qualityClassifier(spark, sf)
      .select(col("doc_id"), (col("verdict") === "keep").as("b")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val cells = h.keys.toSeq.map(k => (h(k), m(k)))
    val (e11, e10, e01, e00) = (
      cells.count(c => c._1 && c._2), cells.count(c => c._1 && !c._2),
      cells.count(c => !c._1 && c._2), cells.count(c => !c._1 && !c._2))
    assert((n11, n10, n01, n00) == (e11.toLong, e10.toLong, e01.toLong, e00.toLong))
    val poE = (e11 + e00).toDouble / n
    val peE = ((e11 + e10).toDouble * (e11 + e01) + (e01 + e00).toDouble * (e10 + e00)) / (n.toDouble * n)
    assert(math.abs(po - poE) < 1e-6 && math.abs(pe - peE) < 1e-6)
    assert(math.abs(kappa - (poE - peE) / (1 - peE)) < 1e-5)
    assert(kappa <= 1.0)
  }

  test("events_power_analysis: n_required decreasing in lift; consistent with the A/B arms") {
    val out = operators.Events.eventsPowerAnalysis(spark, sf).collect()
    assert(out.map(_.getAs[Long]("lift_pct")).toSeq == Seq(1L, 2L, 5L, 10L, 20L))
    // arms match the A/B read-out
    val ab = operators.Events.eventsAbTest(spark, sf).head
    assert(out.head.getAs[Long]("n_a") == ab.getAs[Long]("n_a"))
    assert(out.head.getAs[Long]("n_b") == ab.getAs[Long]("n_b"))
    // a bigger detectable lift needs fewer users; delta scales linearly
    val byLift = out.map(r => r.getAs[Long]("lift_pct") ->
      (r.getAs[Double]("delta_abs"), r.getAs[Long]("n_required"))).toMap
    assert(byLift(1L)._2 > byLift(2L)._2 && byLift(2L)._2 > byLift(5L)._2 &&
      byLift(5L)._2 > byLift(10L)._2 && byLift(10L)._2 > byLift(20L)._2)
    assert(math.abs(byLift(10L)._1 - 10 * byLift(1L)._1) < 1e-4)
    // powered ⇔ observed arm sizes clear the requirement
    out.foreach { r =>
      assert(r.getAs[Boolean]("powered") ==
        (math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) >=
          r.getAs[Long]("n_required")))
    }
    // mde constant across the grid and positive
    assert(out.map(_.getAs[Double]("mde_abs_at_n")).distinct.length == 1)
    assert(out.head.getAs[Double]("mde_abs_at_n") > 0)
  }

  test("text_source_divergence: KL ≥ 0 per source; contributions sum to the mixture JSD ≥ 0") {
    val out = operators.TextAnalysis.textSourceDivergence(spark, sf).collect()
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(out.length == nSources)
    out.foreach { r =>
      assert(r.getAs[Double]("kl_vs_corpus") >= -1e-9,
        s"KL(P_s||C) must be ≥ 0: $r")
      val share = r.getAs[Double]("token_share")
      assert(share > 0 && share < 1)
    }
    // shares sum to 1, contributions are share·kl
    assert(math.abs(out.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-3)
    val mi = out.map(_.getAs[Double]("jsd_contrib")).sum
    assert(mi >= 0)
    // exact local recomputation for ONE source
    val tokens = Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), "\\s+")).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val corpus = tokens.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val total = tokens.length.toDouble
    val s0 = out.head.getAs[String]("source")
    val mine = tokens.filter(_._1 == s0).groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val totS = mine.values.sum
    val klE = mine.map { case (w, c) =>
      (c / totS) * math.log((c / totS) / (corpus(w) / total)) }.sum
    assert(math.abs(out.head.getAs[Double]("kl_vs_corpus") - klE) < 1e-4,
      s"kl ${out.head.getAs[Double]("kl_vs_corpus")} vs local $klE")
  }

  test("dedup_paragraphs: exact recount of the 10-token segment carve") {
    val out = operators.Dedup.dedupParagraphs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // independent local recomputation: same carve, plain Scala maps
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val segs = docs.flatMap { case (id, text) =>
      val t = text.split("\\s+")
      t.grouped(10).filter(_.length == 10).map(s => (id, s.mkString(" ")))
    }
    val perDoc = segs.groupBy(identity).view.mapValues(_.length.toLong)
    val bySeg = perDoc.toSeq.groupBy(_._1._2)
    val expect = bySeg.collect {
      case (seg, hits) if hits.length >= 3 =>
        (seg, hits.length.toLong, hits.map(_._2).sum)
    }.toSet
    assert(out == expect, s"got ${out.size} segments, expected ${expect.size}")
    assert(out.nonEmpty, "templated corpus must have cross-doc segments")
  }

  test("embed_pq_distortion: 16 subspaces; MSE bounded by energy; assigned code is the argmin") {
    val out = operators.Similarity.embedPqDistortion(spark, sf).collect()
    assert(out.length == 16)
    assert(out.map(_.getAs[Long]("m")).toSeq == (0L until 16L))
    val n = Tables.embeddings(spark, sf).count()
    out.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == n)
      val mse = r.getAs[Double]("mse")
      val energy = r.getAs[Double]("mean_energy")
      assert(mse >= 0.0 && energy > 0.0)
      // centroids are (round-1 Lloyd) cluster means: quantizing to
      // them can't be worse than quantizing to the zero vector
      assert(mse <= energy + 1e-6, s"m=${r.getAs[Long]("m")}: $mse > $energy")
      assert(math.abs(r.getAs[Double]("err_share") -
        BigDecimal(mse / energy).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-9)
    }
  }

  test("events_srm_check: segments partition their users; a fair hash shows no SRM") {
    val out = operators.Events.eventsSrmCheck(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(out.length == types + 1)
    val all = out.find(_.getAs[String]("segment") == "_all_").get
    val totalUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(all.getAs[Long]("n_a") + all.getAs[Long]("n_b") == totalUsers)
    out.foreach { r =>
      val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
      val z = (na.toDouble - (na + nb) / 2.0) / math.sqrt((na + nb) / 4.0)
      assert(math.abs(r.getAs[Double]("z") -
        BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(r.getAs[Boolean]("srm") == (math.abs(r.getAs[Double]("z")) > 3.0))
      // md5-based assignment IS fair: a real SRM here would mean the
      // hash itself is broken
      assert(!r.getAs[Boolean]("srm"), s"${r.getAs[String]("segment")}: z=$z")
    }
  }

  test("events_psi_drift: fixed 9-bucket grid; shares sum to 1; arm-vs-arm PSI is tiny") {
    val out = operators.Events.eventsPsiDrift(spark, sf).collect()
    assert(out.map(_.getAs[Long]("bucket")).toSeq == (0L until 9L))
    val sa = out.map(_.getAs[Double]("share_a")).sum
    val sb = out.map(_.getAs[Double]("share_b")).sum
    // smoothing makes the shares a proper distribution by construction
    assert(math.abs(sa - 1.0) < 1e-4 && math.abs(sb - 1.0) < 1e-4)
    val total = out.head.getAs[Double]("psi_total")
    assert(out.forall(_.getAs[Double]("psi_total") == total))
    assert(math.abs(out.map(_.getAs[Double]("psi_term")).sum - total) < 1e-4)
    // each term is (p-q)ln(p/q) >= 0; for two iid samples of the same
    // population PSI concentrates at O(K/n) (smoothed-share sampling
    // noise, K = 9 buckets) — the bound scales with the arm size, so
    // it stays meaningful at every SF while real drift (an O(1) PSI
    // regardless of n) still fails it beyond toy sizes
    out.foreach(r => assert(r.getAs[Double]("psi_term") >= -1e-9))
    val na = out.map(_.getAs[Long]("n_a")).sum
    val nb = out.map(_.getAs[Long]("n_b")).sum
    val iidBound = 10.0 * 9.0 / math.min(na, nb)
    assert(total >= 0.0 && total < iidBound, s"psi_total=$total bound=$iidBound")
  }

  test("events_ks_drift: statistic matches a plain-Scala ECDF recomputation") {
    val out = operators.Events.eventsKsDrift(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val rows = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("value"), expr("(ts_s div 86400 + 4) % 7").between(1, 5))
      .collect()
      .map(x => (BigDecimal(x.getDouble(0))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, x.getBoolean(1)))
    val n1 = rows.count(_._2).toLong; val n2 = rows.count(!_._2).toLong
    assert(r.getAs[Long]("n_weekday") == n1 && r.getAs[Long]("n_weekend") == n2)
    val grid = rows.map(_._1).distinct.sorted
    var c1 = 0L; var c2 = 0L; var ks = 0.0
    for (g <- grid) {
      c1 += rows.count(x => x._1 == g && x._2)
      c2 += rows.count(x => x._1 == g && !x._2)
      ks = math.max(ks, math.abs(c1.toDouble / n1 - c2.toDouble / n2))
    }
    assert(math.abs(r.getAs[Double]("ks_stat") -
      BigDecimal(ks).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val crit = 1.627625 * math.sqrt((n1 + n2).toDouble / (n1 * n2).toDouble)
    assert(math.abs(r.getAs[Double]("ks_crit_01") -
      BigDecimal(crit).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(r.getAs[Boolean]("drift") ==
      (r.getAs[Double]("ks_stat") > r.getAs[Double]("ks_crit_01")))
  }

  test("drift family: PlanLint clean (no global windows, no cartesians, no UDFs)") {
    for (q <- Seq(operators.Events.eventsSrmCheck(spark, sf),
      operators.Events.eventsPsiDrift(spark, sf),
      operators.Events.eventsKsDrift(spark, sf))) {
      val findings = plans.PlanLint.audit(q)
      assert(findings.isEmpty, findings.mkString("; "))
    }
  }

  test("events_changepoint_cusum: matches a plain-Scala CUSUM recomputation") {
    val out = operators.Events.eventsChangepointCusum(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val counts = Tables.events(spark, sf)
      .select(expr("ts_s div 3600").as("hr"))
      .groupBy("hr").count().collect()
      .map(x => (x.getAs[Long]("hr"), x.getAs[Long]("count")))
      .sortBy(_._1)
    val n = counts.length.toLong
    val tot = counts.map(_._2).sum
    val mu = tot.toDouble / n
    val sd = math.sqrt(math.max(0.0,
      counts.map(c => c._2.toDouble * c._2).sum / n - mu * mu))
    assert(r.getAs[Long]("n_hours") == n && r.getAs[Long]("total_events") == tot)
    var cum = 0L; var best = -1.0; var cpHour = Long.MaxValue
    for (((hr, x), i) <- counts.zipWithIndex) {
      cum += x
      val sAbs = math.abs(cum.toDouble - (i + 1).toDouble * mu)
      // earliest hour among ties, like the operator's min(hr) argmax
      if (sAbs > best + 1e-12) { best = sAbs; cpHour = hr }
    }
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("cp_hour") == cpHour)
    assert(math.abs(r.getAs[Double]("cusum_max") - r6(best)) < 1e-9)
    val stat = best / (sd * math.sqrt(n.toDouble))
    assert(math.abs(r.getAs[Double]("stat") - r6(stat)) < 1e-9)
    assert(r.getAs[Boolean]("drift") == (r6(stat) > 1.358))
    // a uniform-rate Poisson series should sit around the null band:
    // the statistic must at least be finite and non-negative
    assert(stat >= 0.0 && !stat.isNaN && !stat.isInfinite)
  }

  test("embed_dim_stats: per-dim moments match a local recomputation") {
    val out = operators.Similarity.embedDimStats(spark, sf).collect()
    val vecs = Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = vecs.head.length
    assert(out.map(_.getAs[Int]("dim")).toSeq == (1 to dims))
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (r <- out) {
      val d = r.getAs[Int]("dim") - 1
      val xs = vecs.map(_(d))
      assert(r.getAs[Long]("n") == vecs.length.toLong)
      // min/max are order-free exact float comparisons
      assert(r.getAs[Double]("min_x") == r6(xs.min))
      assert(r.getAs[Double]("max_x") == r6(xs.max))
      val mean = xs.sum / xs.length
      assert(math.abs(r.getAs[Double]("mean_x") - mean) < 1e-4)
      val sd = math.sqrt(math.max(0.0,
        xs.map(x => x * x).sum / xs.length - mean * mean))
      assert(math.abs(r.getAs[Double]("sd_x") - sd) < 1e-4)
      assert(r.getAs[Double]("min_x") <= mean + 1e-6
        && mean <= r.getAs[Double]("max_x") + 1e-6)
    }
  }

  test("events_uplift_segments: segments partition users; stats match the pooled read-out") {
    val out = operators.Events.eventsUpliftSegments(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 5)
    assert(out.map(_.getAs[Int]("seg_id")).toSeq ==
      out.map(_.getAs[Int]("seg_id")).toSeq.sorted)
    // segments partition the user population
    val totalUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum == totalUsers)
    // pooled arm counts agree with the unsegmented A/B read-out
    val ab = operators.Events.eventsAbTest(spark, sf).head()
    assert(out.map(_.getAs[Long]("n_a")).sum == ab.getAs[Long]("n_a"))
    assert(out.map(_.getAs[Long]("n_b")).sum == ab.getAs[Long]("n_b"))
    out.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      if (na > 0 && nb > 0 && r.getAs[Double]("rev_mean_a") != 0.0) {
        // lift consistent with the per-arm means it was derived from
        val lift = r.getAs[Double]("rev_mean_b") / r.getAs[Double]("rev_mean_a") - 1.0
        assert(math.abs(r.getAs[Double]("lift") - lift) < 1e-4)
      }
    }
  }

  test("knn_graph_mutual: IVF-blocked edges; mutual_deg symmetric and bounded") {
    val out = operators.Similarity.knnGraphMutual(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length == n)
    out.foreach { r =>
      val deg = r.getAs[Long]("deg")
      assert(deg >= 1 && deg <= 5)
      val md = r.getAs[Long]("mutual_deg")
      assert(md >= 0 && md <= deg)
      assert(r.getAs[Double]("mean_sim") <= r.getAs[Double]("max_sim") + 1e-9)
    }
    // mutual edges are symmetric by definition: the total mutual degree
    // over all nodes must be even (each mutual pair contributes 2)
    assert(out.map(_.getAs[Long]("mutual_deg")).sum % 2 == 0)
  }

  test("graph_label_prop: matches a plain-Scala 2-round synchronous LPA") {
    val out = operators.Graph.graphLabelProp(spark, sf).collect()
    val op = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.groupBy(_._1).values.toSeq.flatMap { grp =>
      val ps = grp.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    val nbrs = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    var lbl: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 2) {
      lbl = nbrs.map { case (n, ns) =>
        val freq = ns.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
        // max count, tie -> smallest label
        n -> freq.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val comm = lbl.groupBy(_._2).map { case (c, m) =>
      (c, m.size.toLong, m.keys.min, m.keys.max)
    }.toSeq.sortBy { case (c, n, _, _) => (-n, c) }.take(20)
    val got = out.map(r => (r.getAs[Long]("community"), r.getAs[Long]("n_members"),
      r.getAs[Long]("min_node"), r.getAs[Long]("max_node"))).toSeq
    assert(got == comm)
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to out.length))
  }

  test("text_readability: counts and score match a local recomputation") {
    val out = operators.TextAnalysis.textReadability(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    assert(out.length == docs.size)
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val words = text.split("\\s+")
      val nWords = words.length.toLong
      val nSents = math.max("[.!?]+".r.findAllIn(text).size.toLong, 1L)
      val nSyll = words.map(w =>
        math.max("[aeiouy]+".r.findAllIn(w.toLowerCase).size.toLong, 1L)).sum
      assert(r.getAs[Long]("n_words") == nWords)
      assert(r.getAs[Long]("n_sents") == nSents)
      assert(r.getAs[Long]("n_syll") == nSyll)
      val flesch = 206.835 - 1.015 * nWords.toDouble / nSents -
        84.6 * nSyll.toDouble / nWords
      assert(math.abs(r.getAs[Double]("flesch") - r6(flesch)) < 1e-9)
      val band = if (r6(flesch) >= 60.0) "easy"
        else if (r6(flesch) >= 30.0) "standard" else "hard"
      assert(r.getAs[String]("band") == band)
    }
  }

  test("r8 additions: PlanLint clean") {
    for (q <- Seq(operators.Events.eventsChangepointCusum(spark, sf),
      operators.Similarity.embedDimStats(spark, sf),
      operators.Events.eventsUpliftSegments(spark, sf),
      operators.Similarity.knnGraphMutual(spark, sf),
      operators.Graph.graphLabelProp(spark, sf),
      operators.TextAnalysis.textReadability(spark, sf))) {
      val findings = plans.PlanLint.audit(q)
      assert(findings.isEmpty, findings.mkString("; "))
    }
  }
}
