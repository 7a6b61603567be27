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
}
