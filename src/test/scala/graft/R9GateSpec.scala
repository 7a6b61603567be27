package graft

/** Round-9 batch 2: every measured physical-regime gate records a
  * [[GateLog]] decision, and the gate arithmetic is pinned at
  * sf1/sf10-shaped stats — the r8 sf1 sweep lost a silently-flipped
  * broadcast gate for lack of exactly this visibility.
  */
class R9GateSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  test("ngram-jaccard pair budget: LSH-candidate regime is an exact-scored subset") {
    val exact = operators.Dedup.ngramJaccardScores(spark, sf, minJaccard = 0.5)
      .filter(col("jaccard") >= 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(GateLog.lastDecision("dedup_ngram_jaccard.regime", sf)
      .exists(_.chosen == "exact"))
    val capped = operators.Dedup.ngramJaccardScores(spark, sf,
      minJaccard = 0.5, exactPairBudget = 1.0)
      .filter(col("jaccard") >= 0.5).collect()
    assert(GateLog.lastDecision("dedup_ngram_jaccard.regime", sf)
      .exists(_.chosen == "lsh_candidates"))
    // the LSH-candidate regime reduces the PAIR SET only: every pair
    // it emits carries the identical exact bitset-jaccard score
    assert(capped.nonEmpty && capped.length <= exact.size)
    for (r <- capped) {
      val k = (r.getLong(0), r.getLong(1))
      assert(exact.contains(k), s"pair $k absent from exact scores")
      assert(exact(k) == r.getDouble(2),
        s"score mismatch for $k: ${exact(k)} vs ${r.getDouble(2)}")
    }
  }

  test("graph gates record decisions and choose broadcast at spec scale") {
    operators.Graph.graphPagerank(spark, sf).count()
    val pr = GateLog.lastDecision("graph_pagerank.rank_side", sf)
    assert(pr.exists(_.chosen == "broadcast"), s"pagerank gate: $pr")
    operators.Graph.graphTriangles(spark, sf).count()
    val tr = GateLog.lastDecision("graph_triangles.closing_side", sf)
    assert(tr.exists(_.chosen == "broadcast"), s"triangles gate: $tr")
    operators.Matching.matchBlockingEval(spark, sf,
      broadcastSuppliersMaxBytes = 64L << 20).count()
    val be = GateLog.lastDecision("match_blocking_eval.supplier_side", sf)
    assert(be.exists(_.chosen == "broadcast"), s"blocking-eval gate: $be")
  }

  test("gate arithmetic pins at sf1/sf10/cluster-shaped stats") {
    // the same formulas the operators apply to their measured counts
    def rankSide(nNodes: Long, maxBytes: Long = 256L << 20): String =
      if (nNodes * 64L <= maxBytes) "broadcast" else "shuffle"
    def closingSide(nEdges: Long, maxBytes: Long = 256L << 20): String =
      if (nEdges * 48L <= maxBytes) "broadcast" else "shuffle"
    def supplierSide(nSampled: Long, maxBytes: Long = 64L << 20): String =
      if (nSampled * 128L <= maxBytes) "broadcast" else "shuffle"

    // pagerank nodes = |part| (co-purchase graph): 200k at sf1, 2M at
    // sf10 — both fit; a 1e9-node cluster-scale graph must shuffle
    assert(rankSide(200000L) == "broadcast")
    assert(rankSide(2000000L) == "broadcast")
    assert(rankSide(1000000000L) == "shuffle")

    // co-pair edges ~5.8M at sf1 (measured r8) sit just ABOVE the
    // 5.59M flip point — the silent sf1 flip r8 caught, now visible
    assert(closingSide(5590000L) == "broadcast")
    assert(closingSide(5800000L) == "shuffle")
    assert(closingSide(580000L) == "broadcast") // sf0.1 shape

    // sampled suppliers: 0.5*|supplier| = 5k at sf1, 500k at sf100
    assert(supplierSide(5000L) == "broadcast")
    assert(supplierSide(50000L) == "broadcast")
    assert(supplierSide(1000000L) == "shuffle")
  }
}
