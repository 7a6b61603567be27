package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan linting: the scale-killer checks the test suite pins for
  * every registered query, packaged for library users to run against
  * THEIR plans before a job ships. Each finding names a physical
  * operator whose presence means the query will not survive a 100×
  * scale-up:
  *
  *  - `cartesian-product` — |L|×|R| rows with no pruning; on two
  *    fact-sized inputs this is never the intended plan.
  *  - `scala-udf` — breaks whole-stage codegen in the hot path;
  *    a native Expression is ~10× faster.
  *  - `global-window` — an unpartitioned WindowExec pulls its ENTIRE
  *    input into one task. Accepted only when a limit already
  *    bounded the input to a constant (the top-k-with-rank shape).
  *
  * Returns human-readable findings; empty means clean. This is a
  * static plan check — it cannot see runtime sizes, so a forced
  * broadcast of a relation that outgrows memory still needs a
  * measured gate (see graph_triangles' edge-count guard).
  */
object PlanLint {

  def audit(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan
    val findings = Seq.newBuilder[String]
    def expand(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case o => o.children
      }
      p +: kids.flatMap(expand)
    }
    val nodes = expand(plan)
    def boundedBelow(w: SparkPlan): Boolean = expand(w).tail.exists {
      case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
           _: CollectLimitExec | _: LocalLimitExec => true
      case _ => false
    }
    nodes.foreach {
      case c: CartesianProductExec =>
        findings += s"cartesian-product: ${c.nodeName} joins without keys or broadcast"
      case w: WindowExec if w.partitionSpec.isEmpty && !boundedBelow(w) =>
        findings += "global-window: unpartitioned WindowExec over unbounded input " +
          s"(${w.windowExpression.mkString(", ").take(120)})"
      case _ => ()
    }
    // walk the expression trees, not the plan STRING — a ScalaUDF
    // prints as "UDF(...)", so a string match never fires
    val hasUdf = nodes.exists(_.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF])))
    if (hasUdf)
      findings += "scala-udf: interpreted UDF in the plan breaks whole-stage codegen"
    findings.result()
  }
}
