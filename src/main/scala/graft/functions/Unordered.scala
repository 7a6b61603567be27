package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.graftshim.GraftShim

/** Production-ordering seam. Registered queries end with a global
  * `orderBy` purely so the correctness harness's hash compare sees a
  * total order; the rows themselves are already final. At scale that
  * trailing sort is a needless global range-exchange over the whole
  * output — on a per-entity result (events_user_profile,
  * text_perplexity, match_*) it can dominate the query.
  *
  * `Unordered(q)` strips ONE trailing global Sort from the logical
  * plan (and nothing else — partition-local sorts, window sorts, and
  * TakeOrdered top-ks are semantics, not presentation, and stay).
  * Production callers wrap any registered query:
  * {{{
  *   val df = Unordered(SparkEntry.queries("events_user_profile")(spark, dir))
  * }}}
  * Idempotent and safe on queries with no trailing sort.
  */
object Unordered {
  def apply(df: DataFrame): DataFrame = df.queryExecution.logical match {
    case s: Sort if s.global => GraftShim.ofRows(df.sparkSession, s.child)
    case _ => df
  }
}
