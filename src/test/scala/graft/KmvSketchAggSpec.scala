package graft

import org.apache.spark.sql.functions._

/** Invariants for the native KMV aggregate: exactness below k,
  * partitioning-independence (merge correctness), SQL registration,
  * and the map-side partial-aggregation plan shape.
  */
class KmvSketchAggSpec extends SparkSpec {

  private def kmvCol(c: org.apache.spark.sql.Column, k: Int) = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(
      functions.KmvSketchAgg(GraftShim.expression(c), k).toAggregateExpression())
  }

  test("below k the sketch is the exact distinct count") {
    import spark.implicits._
    val df = Seq("a", "b", "c", "a", "b", "a").toDF("v")
      .select(functions.HexExprs.hexPrefixLong(md5(col("v")), 8).as("h"))
    val est = df.agg(kmvCol(col("h"), 64).as("e")).head.getDouble(0)
    assert(est == 3.0)
  }

  test("estimate is independent of input partitioning (merge path)") {
    import spark.implicits._
    val vals = (1 to 5000).map(i => s"tok_$i")
    val df = vals.toDF("v")
      .select(functions.HexExprs.hexPrefixLong(md5(col("v")), 8).as("h"))
    val one = df.repartition(1).agg(kmvCol(col("h"), 64)).head.getDouble(0)
    val many = df.repartition(17).agg(kmvCol(col("h"), 64)).head.getDouble(0)
    assert(one == many, s"merge changed the sketch: $one vs $many")
    // sanity: within 30% of truth at k=64
    assert(math.abs(one - 5000.0) / 5000.0 < 0.3, s"estimate $one too far from 5000")
  }

  test("duplicate hashes collapse (set semantics, not heap semantics)") {
    import spark.implicits._
    // 3 distinct values, each repeated 1000x, k=4 => must report 3
    val df = (1 to 3000).map(i => s"x${i % 3}").toDF("v")
      .select(functions.HexExprs.hexPrefixLong(md5(col("v")), 8).as("h"))
      .repartition(7)
    val est = df.agg(kmvCol(col("h"), 4).as("e")).head.getDouble(0)
    assert(est == 3.0)
  }

  test("SQL registration: graft_kmv_distinct agrees with the Column API") {
    import spark.implicits._
    Seq("p", "q", "r", "p").toDF("v").createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      """SELECT graft_kmv_distinct(graft_hex_long(md5(v), 8), 64) AS e
        |FROM kmv_in""".stripMargin).head.getDouble(0)
    assert(viaSql == 3.0)
  }

  test("plan aggregates map-side: partial sketch before the exchange") {
    val toks = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), "\\s+")).as("token"))
      .select(col("lang"),
        functions.HexExprs.hexPrefixLong(md5(col("token")), 8).as("h"))
    val p = toks.groupBy("lang").agg(kmvCol(col("h"), 64))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_kmv_distinct"),
      s"no map-side partial aggregation:\n$p")
  }
}
