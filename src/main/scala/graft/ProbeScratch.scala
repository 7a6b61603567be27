package graft

import org.apache.spark.sql.functions._

/** Throwaway timing harness for optimization-session diagnostics —
  * times labeled sub-plans with the noop sink so a slow registered
  * query can be decomposed stage by stage. Not part of any driver
  * contract; never registered in SparkEntry.
  */
object ProbeScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus]", math.max(cpus, 4)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.registerInto(spark)

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
    }

    val l = Tables.lineitem(spark, dir)
    time("lineitem scan (3 cols)")(l.select("l_orderkey", "l_quantity", "l_partkey"))
    time("lineitem groupBy orderkey sum(qty)")(
      l.groupBy("l_orderkey").agg(round(sum("l_quantity"), 2).as("s")))
    time("lineitem groupBy orderkey sum(qty) AGAIN")(
      l.groupBy("l_orderkey").agg(round(sum("l_quantity"), 2).as("s")))
    val big = l.groupBy("l_orderkey")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"))
      .filter(col("sum_qty") > 300.0)
    val o = Tables.orders(spark, dir)
    time("orders join big")(o.join(big, col("o_orderkey") === col("l_orderkey")))
    time("full q18")(graft.operators.Olap.q18LargeOrders(spark, dir))
    PlanCache.clear()
    spark.stop()
  }
}
