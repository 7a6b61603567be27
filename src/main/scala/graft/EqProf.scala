import org.apache.spark.sql.functions._
object EqProf {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[prof] $name%-18s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val e = graft.Tables.events(spark, dir).select(col("event_type"), col("value"))
    t("count")(e.count())
    t("quantiles-cold")(graft.operators.ExactQuantiles.percentiles(e, Seq("event_type"), "value", Seq(0.5,0.9,0.99)).count())
    t("quantiles-warm")(graft.operators.ExactQuantiles.percentiles(e, Seq("event_type"), "value", Seq(0.5,0.9,0.99)).count())
    val tv = graft.PlanCache.cached("etv", spark, dir)(e)
    t("quantiles-cached")(graft.operators.ExactQuantiles.percentiles(tv, Seq("event_type"), "value", Seq(0.5,0.9,0.99)).count())
    t("native")(e.groupBy("event_type").agg(expr("percentile(value, 0.5)")).count())
    spark.stop()
  }
}
