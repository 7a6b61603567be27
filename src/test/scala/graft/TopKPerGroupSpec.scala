package graft

import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroup

class TopKPerGroupSpec extends SparkSpec {

  test("custom operator matches the window-based formulation") {
    val viaCustom = TopKPerGroup(
      Tables.orders(spark, sf), Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(_.toSeq).toSet
    val viaWindow = operators.Olap.topkPerGroup(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(_.toSeq).toSet
    assert(viaCustom == viaWindow)
  }

  test("physical plan uses TopKPerGroupExec, no Sort or Window") {
    val df = TopKPerGroup(Tables.orders(spark, sf), Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.linesIterator.take(6).mkString("\n"))
    assert(!plan.contains("Window"), "must not fall back to a window")
    assert(!plan.contains("Sort "), "must not sort whole groups")
  }

  test("k=1 returns one row per group; ascending order works") {
    val df = TopKPerGroup(Tables.orders(spark, sf), Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", false)), 1)
    val perGroup = df.groupBy("o_custkey").count()
      .agg(max("count")).head.getLong(0)
    assert(perGroup == 1)
    // each kept row is the group minimum
    val mins = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(min("o_totalprice").as("m"))
    val joined = df.join(mins, "o_custkey")
      .filter(col("o_totalprice") =!= col("m")).count()
    assert(joined == 0)
  }

  test("operator composes with downstream transforms") {
    val df = TopKPerGroup(Tables.orders(spark, sf), Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
      .filter(col("o_totalprice") > 0)
      .groupBy("o_custkey").agg(sum("o_totalprice").as("s"))
    assert(df.count() > 0)
  }
}
