package graft

import org.apache.spark.sql.functions._
import graft.functions.BoundedLev

class BoundedLevSpec extends SparkSpec {

  test("banded similarity equals the full levenshtein formula above threshold") {
    // real names (all near-identical: exercises the exact path) PLUS
    // cross-table name pairs (dissimilar: exercises the band abandon)
    val c = Tables.customer(spark, sf)
      .select(operators.Matching.normName(col("c_name")).as("a")).limit(40)
    val s = Tables.supplier(spark, sf)
      .select(operators.Matching.normName(col("s_name")).as("b")).limit(40)
    val p = Tables.part(spark, sf)
      .select(operators.Matching.normName(col("p_name")).as("b")).limit(40)
    val pairs = c.crossJoin(s.unionByName(p)) // part names are unrelated to customer names
      .withColumn("full", round(operators.Matching.tokenSortSim(col("a"), col("b")), 6))
      .withColumn("banded", round(BoundedLev.sim(col("a"), col("b"), 0.5), 6))
      .collect()
    pairs.foreach { r =>
      val (full, banded) = (r.getDouble(2), r.getDouble(3))
      if (full >= 0.5) assert(banded == full, s"$r")
      else assert(banded < 0.5, s"$r") // below threshold: any value < 0.5 ok
    }
    // both paths exercised
    assert(pairs.exists(_.getDouble(2) >= 0.5))
    assert(pairs.exists(_.getDouble(2) < 0.5))
  }

  test("expression is codegen-native (no UDF) and null-safe") {
    import spark.implicits._
    val rows = Seq(("abc", "abd"), ("abc", null)).toDF("a", "b")
      .withColumn("s", BoundedLev.sim(col("a"), col("b"), 0.5))
      .collect()
    assert(rows(0).getDouble(2) == 1.0 - 1.0 / 3)
    assert(rows(1).isNullAt(2))
    // plan pin over a parquet-backed column (local relations
    // constant-fold the projection away)
    val df = Tables.customer(spark, sf)
      .withColumn("s", BoundedLev.sim(col("c_name"), col("c_mktsegment"), 0.5))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_bounded_sim"), p.linesIterator.take(4).mkString("\n"))
    assert(!p.toLowerCase.contains("scalaudf"))
  }
}
