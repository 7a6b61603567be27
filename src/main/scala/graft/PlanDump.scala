package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` of named registered queries to
  * one file per query — the per-round optimization evidence
  * (`plans/r<N>/<query>_{before,after}.txt`). Unlike [[Plans]] (which
  * maintains the single reviewable PLANS.md), this emits standalone
  * files so a before/after pair can be diffed query by query.
  *
  * Usage:
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <q1> [q2 ...]"
  *   sbt "runMain graft.PlanDump plans/r12 _after match_tfidf_topk graph_kcore"
  *
  * Plans are generated over sf0.001 (plan shape is data-size
  * independent pre-execution; AQE's runtime rewrites never appear in
  * a not-yet-executed formatted plan either way).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names  = args.drop(2).toSeq
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Files.createDirectories(outDir)
    val spark = GraftSession.local(4)
    graft.plans.GraftExtensions.registerInto(spark)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(build) =>
          val df = build(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(outDir.resolve(s"$name$suffix.txt"), plan)
          println(s"[plandump] wrote $name$suffix.txt")
        case None =>
          println(s"[plandump] SKIP unknown query: $name")
      }
    }
    PlanCache.clear()
    spark.stop()
  }
}
