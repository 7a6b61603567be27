package graft

import org.apache.spark.sql.functions._

/** Invariants for the native HLL aggregate and the shared estimator:
  * agreement between the aggregate and the compositional register
  * formulation (they must be the SAME number — both feed the same
  * DuckDB oracle), partitioning-independence of the bytewise-max
  * merge, estimate accuracy, SQL registration, and the map-side
  * partial-aggregation plan shape.
  */
class HllSketchAggSpec extends SparkSpec {

  private def hllCol(c: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(
      functions.HllSketchAgg(GraftShim.expression(c)).toAggregateExpression())
  }

  private def hash(c: org.apache.spark.sql.Column) =
    functions.HexExprs.hexPrefixLong(md5(c), 14)

  test("estimator math: rho and the local estimate match a reference fold") {
    // rho = 49 - bitlength(low48), 49 at zero
    assert(functions.Hll.rho(0L) == 49)
    assert(functions.Hll.rho(1L) == 48)
    assert(functions.Hll.rho(0x800000000000L) == 1) // top bit of 48 set
    // all registers empty: isum = 256 * 2^49, linear counting of 0...
    // (degenerate, never evaluated in practice: no input -> no group)
    // one register at rho=1, rest empty: linear-counting regime
    val isum = (1L << 48) + 255L * functions.Hll.scale
    val est = functions.Hll.estimate(isum, 255)
    assert(math.abs(est - 256.0 * math.log(256.0 / 255.0)) < 1e-6)
  }

  test("estimate is independent of input partitioning (bytewise-max merge)") {
    import spark.implicits._
    val vals = (1 to 5000).map(i => s"tok_$i")
    val df = vals.toDF("v").select(hash(col("v")).as("h"))
    val one = df.repartition(1).agg(hllCol(col("h"))).head.getDouble(0)
    val many = df.repartition(17).agg(hllCol(col("h"))).head.getDouble(0)
    assert(one == many, s"merge changed the sketch: $one vs $many")
    // HLL(m=256) standard error is 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert(math.abs(one - 5000.0) / 5000.0 < 0.26, s"estimate $one too far from 5000")
  }

  test("duplicates do not move the estimate (max-register semantics)") {
    import spark.implicits._
    val once = (1 to 300).map(i => s"v$i").toDF("v")
      .select(hash(col("v")).as("h"))
      .agg(hllCol(col("h"))).head.getDouble(0)
    val repeated = (1 to 30000).map(i => s"v${i % 300 + 1}").toDF("v")
      .repartition(7)
      .select(hash(col("v")).as("h"))
      .agg(hllCol(col("h"))).head.getDouble(0)
    assert(once == repeated)
  }

  test("aggregate agrees exactly with the compositional register formulation") {
    // the two query paths (approx_distinct_hll vs _agg) share one
    // oracle estimator — if this drifts, one of the two oracles lies
    val a = operators.Sketches.approxDistinctHll(spark, sf)
      .select("lang", "hll_est").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = operators.Sketches.approxDistinctHllAgg(spark, sf)
      .select("lang", "hll_est").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b, s"compositional $a vs native $b")
  }

  test("SQL registration: graft_hll_distinct agrees with the Column API") {
    import spark.implicits._
    val vals = (1 to 100).map(i => s"s$i")
    vals.toDF("v").createOrReplaceTempView("hll_in")
    val viaSql = spark.sql(
      """SELECT graft_hll_distinct(graft_hex_long(md5(v), 14)) AS e
        |FROM hll_in""".stripMargin).head.getDouble(0)
    val viaCol = vals.toDF("v").select(hash(col("v")).as("h"))
      .agg(hllCol(col("h"))).head.getDouble(0)
    assert(viaSql == viaCol)
  }

  test("plan aggregates map-side: partial sketch before the exchange") {
    val toks = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), "\\s+")).as("token"))
      .select(col("lang"), hash(col("token")).as("h"))
    val p = toks.groupBy("lang").agg(hllCol(col("h")))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_hll_distinct"),
      s"no map-side partial aggregation:\n$p")
  }
}
