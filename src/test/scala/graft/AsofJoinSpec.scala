package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.AsofJoin

class AsofJoinSpec extends SparkSpec {

  test("asof join matches the window formulation on events") {
    val out = operators.Events.eventsAsofJoin(spark, sf)
    // the union+window encoding the custom exec replaced
    val e = Tables.events(spark, sf)
    val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = e.withColumn("signup_event",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("signup_ts",
        last(when(col("event_type") === "signup", col("ts_s")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("signup_event"),
        (col("ts_s") - col("signup_ts")).as("gap_s"))
      .orderBy("event_id")
    assert(out.collect().toSeq == expected.collect().toSeq)
  }

  test("plan uses the custom AsofJoinExec") {
    val p = operators.Events.eventsAsofJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p)
  }

  test("left rows with no prior right row null-extend") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 5L), (2L, 7L)).toDF("k", "t")
    val r = Seq((1L, 6L, "a"), (1L, 9L, "b"), (3L, 1L, "z")).toDF("rk", "rt", "v")
    val out = AsofJoin(l, r, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"))
      .orderBy("k", "t").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(4)) null else x.getString(4)))
    assert(out.toSeq == Seq((1L, 5L, null), (1L, 10L, "b"), (2L, 7L, null)))
  }

  private def matches(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Any)] = {
    import df.sparkSession.implicits._
    df.orderBy("k", "t").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(4)) null else x.getString(4))).toSeq
  }

  test("forward direction: earliest at-or-after; same right row serves many lefts") {
    import spark.implicits._
    val l = Seq((1L, 5L), (1L, 6L), (1L, 9L), (1L, 20L), (2L, 1L)).toDF("k", "t")
    val r = Seq((1L, 8L, "a"), (1L, 15L, "b"), (2L, 0L, "z")).toDF("rk", "rt", "v")
    val out = matches(AsofJoin(l, r, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"),
      direction = "forward"))
    // t=5 and t=6 BOTH match rt=8 (the buffered candidate is not
    // consumed by an emit); t=9 skips it to rt=15; t=20 has nothing
    // after; key 2's only right row is strictly before → null
    assert(out == Seq((1L, 5L, "a"), (1L, 6L, "a"), (1L, 9L, "b"),
      (1L, 20L, null), (2L, 1L, null)))
  }

  test("forward treats an exact time tie as a match") {
    import spark.implicits._
    val l = Seq((1L, 8L)).toDF("k", "t")
    val r = Seq((1L, 8L, "a")).toDF("rk", "rt", "v")
    val out = matches(AsofJoin(l, r, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"),
      direction = "forward"))
    assert(out == Seq((1L, 8L, "a")), "at-or-after includes the tie")
  }

  test("tolerance gates the found match without falling back") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 7L, "a"), (1L, 50L, "b")).toDF("rk", "rt", "v")
    // backward: t=10 matches rt=7 (Δ3 ≤ 5); t=100 has rt=50 at Δ50 —
    // OUT of tolerance, and it must NOT fall back to rt=7
    val back = matches(AsofJoin(l, r, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"),
      direction = "backward", tolerance = 5L))
    assert(back == Seq((1L, 10L, "a"), (1L, 100L, null)))
    val fwd = matches(AsofJoin(l, r, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"),
      direction = "forward", tolerance = 5L))
    assert(fwd == Seq((1L, 10L, null), (1L, 100L, null)),
      "forward Δ40 and no-candidate both null-extend")
  }

  test("nearest picks the closer side, tie goes backward") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 14L), (1L, 30L)).toDF("k", "t")
    val r = Seq((1L, 8L, "a"), (1L, 18L, "b")).toDF("rk", "rt", "v")
    val out = matches(AsofJoin(l, r, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"),
      direction = "nearest"))
    // t=10: back Δ2 vs fwd Δ8 → a; t=14: back Δ6 vs fwd Δ4 → b;
    // t=30: only backward side remains → b
    assert(out == Seq((1L, 10L, "a"), (1L, 14L, "b"), (1L, 30L, "b")))
    val tie = matches(AsofJoin(Seq((1L, 13L)).toDF("k", "t"), r,
      Seq("k"), Seq("rk"), Seq("t"), Seq("rt"), direction = "nearest"))
    assert(tie == Seq((1L, 13L, "a")), "equal distance resolves backward")
  }

  test("events_asof_forward matches the forward window formulation with tolerance") {
    val out = operators.Events.eventsAsofForward(spark, sf)
    val e = Tables.events(spark, sf)
    val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val expected = e
      .withColumn("nv_event",
        first(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("nv_ts",
        first(when(col("event_type") === "view", col("ts_s")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        when(col("nv_ts") - col("ts_s") <= 3600, col("nv_event")).as("view_event"),
        when(col("nv_ts") - col("ts_s") <= 3600, col("nv_ts") - col("ts_s")).as("lead_s"))
      .orderBy("event_id")
    assert(out.collect().toSeq == expected.collect().toSeq)
    assert(out.filter(col("view_event").isNotNull).count() > 0,
      "the corpus must exercise the matched path")
    assert(out.filter(col("view_event").isNull).count() > 0,
      "the corpus must exercise the null-extended path")
  }
}
