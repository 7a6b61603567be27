package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Core OLAP aggregations — the analytics the reference runs in
  * Postgres/dbt after loading (reference: sql/schema_postgres.sql
  * analytics schema; firmable_dbt models).
  *
  * Scale notes: group-bys are partial-aggregated map-side by Spark;
  * joins broadcast the dimension side explicitly; final orderBy is on
  * already-aggregated (small) output so the global sort is cheap at
  * any input scale.
  */
object Olap {

  /** Pricing summary: group-agg with sum/avg/count over the largest
    * fact table. Rounded so the DuckDB oracle hash-matches despite
    * summation-order float drift.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Revenue of top unshipped-style orders: 3-way join, filter both
    * fact sides before the join (predicate pushdown to the scans),
    * top-10 on rounded revenue with a key tiebreak.
    */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Region revenue: 6-way star join; all dims broadcast, the two
    * fact tables shuffle once on orderkey.
    */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy("n_name")
  }

  /** Top-3 orders per customer by totalprice — windowed top-k, the
    * canonical "best match per record" shape the matcher also uses.
    */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** CUBE over two order dimensions with ALL-labeled subtotals. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n_orders"), col("sum_price"))
      .orderBy("orderstatus", "orderpriority")
  }

  /** Market share: BUILDING-segment revenue fraction per order year
    * (TPC-H q8 shape — conditional aggregate over a ratio).
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("c_mktsegment") === "BUILDING", rev).otherwise(lit(0.0))) / sum(rev),
        6).as("building_share"))
      .orderBy("o_year")
  }

  /** Anti join: parts never ordered (left_anti = NOT EXISTS). */
  def partsNeverOrdered(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir).select("l_partkey").distinct()
    p.join(l, col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey")
  }

  /** Set operations over nation keys: nations having customers but no
    * suppliers and vice versa (EXCEPT), plus the overlap (INTERSECT).
    */
  def nationCoverage(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nk")).distinct()
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nk")).distinct()
    val both = c.intersect(s).withColumn("coverage", lit("both"))
    val onlyC = c.except(s).withColumn("coverage", lit("customers_only"))
    val onlyS = s.except(c).withColumn("coverage", lit("suppliers_only"))
    both.unionByName(onlyC).unionByName(onlyS).orderBy("coverage", "nk")
  }

  /** ROLLUP with ALL-labeled subtotals (coalesce keeps the oracle
    * null-handling trivial).
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.rollup("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")
  }

  /** Status-by-priority pivot: order counts and revenue spread across
    * the order-status values as COLUMNS — the crosstab/pivot report
    * shape the reference serves from Postgres. Statuses are pinned
    * explicitly (O/F/P), so the pivot is one partial-aggregated pass
    * with a fixed output schema — no values-discovery pre-query, no
    * schema drift between runs (the failure mode of open-ended
    * `pivot(col)` at scale).
    */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_finished"),
        coalesce(col("P"), lit(0L)).as("n_pending"))
      .withColumn("n_total", col("n_open") + col("n_finished") + col("n_pending"))
      .orderBy("o_orderpriority")
  }

  /** Priority counts over orders having at least one discounted line
    * — the TPC-H Q4 shape (EXISTS-correlated subquery) as a left-semi
    * join: the fact side streams once, the semi join never duplicates
    * an order across its matching lines, and no distinct is needed
    * anywhere. At scale both sides shuffle on the order key.
    */
  def q4PriorityExists(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_discount") > 0.05)
      .select("l_orderkey")
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }
}
