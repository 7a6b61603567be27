package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen expression — the
  * transposition-tolerant complement to [[BoundedLev]] for short-name
  * matching (reference analog: the fuzzy-matching family of
  * matching/entity_matching_optimized.py; algorithm per the public
  * Jaro/Winkler formulation). Semantics pinned to DuckDB's
  * `jaro_winkler_similarity` so the oracle can check it exactly:
  * either side empty → 0.0; match window ⌊max(n,m)/2⌋−1;
  * transpositions = half the mismatched matched-char positions;
  * Winkler prefix boost (ℓ ≤ 4, p = 0.1) only above jaro > 0.7.
  * Comparison is over UTF-8 BYTES (DuckDB's unit — 'café' is 5
  * units), not UTF-16 chars, so non-ASCII names score identically
  * in both engines.
  */
object JaroWinkler {

  def sim(au: UTF8String, bu: UTF8String): Double = {
    val s = au.getBytes
    val t = bu.getBytes
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var mismatched = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) mismatched += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - mismatched / 2.0) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(n, m))
    while (l < maxL && s(l) == t(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  def sim(a: Column, b: Column): Column =
    GraftShim.column(JaroWinklerExpr(
      GraftShim.expression(a), GraftShim.expression(b)))
}

case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two strings, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  // static-forwarder call: no UDF serialization, stays inside
  // whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
