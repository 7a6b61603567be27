package graft

import org.apache.spark.sql.functions._

/** ExactQuantiles must reproduce Spark's native exact percentile()
  * bit-for-bit (the consumers' oracles were originally validated
  * against it) while never buffering a group's values in one
  * aggregation buffer — the plan shape is pinned in PlanAuditSpec;
  * the VALUES are pinned here, including the edge shapes (tiny
  * groups, all-equal values, single row, nulls).
  */
class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.1, 0.5, 0.9, 0.99)

  private def native(df: org.apache.spark.sql.DataFrame, groupCol: String,
                     valueCol: String): Map[(String, Double), Double] =
    df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, ${ps.head})").as(s"q${ps.head}"),
        ps.tail.map(p => expr(s"percentile($valueCol, $p)").as(s"q$p")): _*)
      .collect()
      .flatMap(r => ps.zipWithIndex.map { case (p, i) =>
        (r.getString(0), p) -> r.getDouble(i + 1) })
      .toMap

  // force the above-cap regime so the BIN plan is what's under test
  private def bounded(df: org.apache.spark.sql.DataFrame, groupCol: String,
                      valueCol: String, nBins: Int = 64): Map[(String, Double), Double] =
    operators.ExactQuantiles.percentiles(df, Seq(groupCol), valueCol, ps, nBins,
        maxNativeGroupValues = 0L)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap

  test("matches native percentile() exactly on the events table") {
    val e = Tables.events(spark, sf).select(col("event_type"), col("value"))
    val want = native(e, "event_type", "value")
    val got = bounded(e, "event_type", "value")
    assert(got.keySet == want.keySet)
    for ((k, v) <- want)
      assert(got(k) == v, s"$k: got ${got(k)}, native $v")
  }

  test("edge shapes: single row, ties, all-equal, nulls, tiny bins") {
    val df = Seq(
      ("one", Some(42.0)),
      ("ties", Some(1.0)), ("ties", Some(1.0)), ("ties", Some(2.0)),
      ("ties", Some(2.0)), ("ties", Some(3.0)),
      ("flat", Some(7.5)), ("flat", Some(7.5)), ("flat", Some(7.5)),
      ("nulls", Some(1.0)), ("nulls", None), ("nulls", Some(9.0)),
      ("spread", Some(-5.0)), ("spread", Some(0.0)), ("spread", Some(1e9))
    ).toDF("g", "v")
    val want = native(df, "g", "v")
    // nBins=2 forces multi-rank bins — the hard path
    val got = bounded(df, "g", "v", nBins = 2)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want)
      assert(got(k) == v, s"$k: got ${got(k)}, native $v")
  }

  test("global (no group columns) form matches and interpolates in both regimes") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    for (cap <- Seq(0L, 4000000L)) {
      val got = operators.ExactQuantiles.percentiles(df, Seq.empty, "v", Seq(0.5),
          maxNativeGroupValues = cap)
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
      assert(got == Map(0.5 -> 2.5), s"cap=$cap") // pos = 1.5 → (2+3)/2
    }
  }

  test("regime gate: measured small groups take the native single-stage plan") {
    val e = Tables.events(spark, sf).select(col("event_type"), col("value"))
    val below = operators.ExactQuantiles.percentiles(e, Seq("event_type"), "value", ps)
    assert(below.queryExecution.executedPlan.toString.toLowerCase
      .contains("percentile("), "sub-cap groups must use the one-stage native aggregate")
    val above = operators.ExactQuantiles.percentiles(e, Seq("event_type"), "value", ps,
      maxNativeGroupValues = 0L)
    assert(!above.queryExecution.executedPlan.toString.toLowerCase
      .contains("percentile("), "above the cap nothing may buffer raw values")
    // and the two regimes agree bit-for-bit
    val a = below.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val b = above.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(a == b)
  }
}
