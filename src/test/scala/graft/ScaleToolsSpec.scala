package graft

import org.apache.spark.sql.functions._
import graft.functions.Skew

class ScaleToolsSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain-join rows with more tasks") {
    val c = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
      .withColumnRenamed("s_nationkey", "c_nationkey")
    val plain = c.join(s, Seq("c_nationkey"))
      .select("c_custkey", "s_suppkey").collect().toSet
    val salted = Skew.saltedJoin(c, s, Seq("c_nationkey"), col("c_custkey"), 8)
      .select("c_custkey", "s_suppkey").collect().toSet
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a killed prior run can leave the managed location behind with
    // no catalog entry; saveAsTable then refuses the path
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    Tables.orders(spark, sf).write.bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located buckets: the join must not re-shuffle either side
    assert(!plan.contains("Exchange hashpartitioning"), plan.linesIterator.take(12).mkString("\n"))
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }
}
