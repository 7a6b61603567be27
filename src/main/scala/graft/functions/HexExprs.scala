package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse the first `digits` hex chars of a string into a long — the
  * uniform-hash kernel under content sampling, KMV sketching, and
  * gram bucketing (value = md5-prefix as an integer). The portable
  * formulation is an `aggregate` lambda over `instr` nibble lookups,
  * which runs INTERPRETED (one lambda dispatch per nibble, boxed
  * longs); this native expression is a primitive byte loop in
  * generated code with identical semantics, including the instr-style
  * -1 for a non-hex character. Exact for digits ≤ 15 (60 bits).
  */
case class HexPrefixLongExpr(child: Expression, digits: Int)
  extends UnaryExpression {
  require(digits >= 1 && digits <= 15, "digits must be in [1, 15]")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hex_long"

  override protected def nullSafeEval(a: Any): Any = {
    val bs = a.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var k = 0
    val n = math.min(digits, bs.length)
    while (k < n) {
      val c = bs(k)
      val v =
        if (c >= '0' && c <= '9') (c - '0').toLong
        else if (c >= 'a' && c <= 'f') (c - 'a' + 10).toLong
        else -1L
      acc = acc * 16L + v
      k += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName: two instances of this expression can land in the
      // same whole-stage-codegen scope — fixed identifiers would
      // collide and silently fall the stage back to interpreted mode
      val bs = ctx.freshName("bs")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val v = ctx.freshName("v")
      s"""
         |byte[] $bs = $a.getBytes();
         |long $acc = 0L;
         |int $n = java.lang.Math.min($digits, $bs.length);
         |for (int $k = 0; $k < $n; $k++) {
         |  byte $c = $bs[$k];
         |  long $v = ($c >= '0' && $c <= '9') ? (long)($c - '0')
         |    : (($c >= 'a' && $c <= 'f') ? (long)($c - 'a' + 10) : -1L);
         |  $acc = $acc * 16L + $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HexExprs {
  def hexPrefixLong(c: Column, digits: Int): Column =
    GraftShim.column(HexPrefixLongExpr(GraftShim.expression(c), digits))

  /** md5-prefix uniform hash in [0,1): exact for 8 hex digits. */
  def uniformHash(c: Column, digits: Int = 8): Column = {
    import org.apache.spark.sql.functions._
    hexPrefixLong(md5(c), digits).cast("double") /
      lit(math.pow(16.0, digits))
  }
}
