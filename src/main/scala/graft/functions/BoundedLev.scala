package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Threshold-aware token-sort similarity: 1 − lev/maxlen computed
  * with a Ukkonen BAND of width ⌊(1−minScore)·maxlen⌋+1 instead of
  * the full O(n·m) matrix. Every pair whose similarity can reach the
  * threshold gets the EXACT distance (the +1 slack also covers
  * round-to-6 boundary lifts); pairs that provably cannot return
  * −1.0 and fall to the caller's `score >= minScore` filter. At a
  * 0.5 threshold this halves the DP area and abandons hopeless rows
  * early — the dominant cost of blocked fuzzy matching is exactly
  * this per-pair distance.
  */
object BoundedLev {

  /** Exact within the band; −1.0 when distance > band. ASCII-safe
    * length semantics (UTF-16 units), matching Spark/DuckDB
    * levenshtein on the name data this engine matches.
    */
  def sim(a: UTF8String, b: UTF8String, minScore: Double): Double = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    val maxLen = math.max(n, m)
    if (maxLen == 0) return 1.0
    val bound = ((1.0 - minScore) * maxLen).toInt + 1
    if (math.abs(n - m) > bound) return -1.0
    val inf = bound + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= bound) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - bound)
      val hi = math.min(m, i + bound)
      java.util.Arrays.fill(cur, inf)
      if (i <= bound) cur(0) = i
      var rowMin = cur(0)
      var jj = lo
      while (jj <= hi) {
        val cost = if (s.charAt(i - 1) == t.charAt(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      if (rowMin >= inf) return -1.0 // whole band over bound: abandon
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    val d = prev(m)
    if (d >= inf) -1.0 else 1.0 - d.toDouble / maxLen
  }

  def sim(a: Column, b: Column, minScore: Double): Column =
    GraftShim.column(BoundedTokenSimExpr(
      GraftShim.expression(a), GraftShim.expression(b), minScore))
}

case class BoundedTokenSimExpr(left: Expression, right: Expression,
                               minScore: Double) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two strings, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_bounded_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BoundedLev.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], minScore)

  // a static-forwarder call, not a UDF: no serialization, no boxing
  // beyond the call, stays inside whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BoundedLev.sim($a, $b, $minScore);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
