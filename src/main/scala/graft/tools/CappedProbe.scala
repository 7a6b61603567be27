package graft.tools

import graft.GraftSession

/** Scratch: time the capped-regime matcher paths with a forced-low
  * budget at an arbitrary SF dir. Not part of the driver contract.
  */
object CappedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.registerInto(spark)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("tfidf_capped")(graft.operators.Matching
      .matchTfidfTopk(spark, dir, 4096, exactPairBudget = 1e6).count())
    time("bm25_capped")(graft.operators.Matching
      .matchBm25Topk(spark, dir, 4096, exactPairBudget = 1e6).count())
    graft.PlanCache.clear()
    spark.stop()
  }
}
