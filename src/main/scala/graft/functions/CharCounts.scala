package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character histogram as a native expression: one pass over
  * the string, map<char, count> out — the aggregation-input reducer
  * behind [[graft.operators.TextAnalysis.textCharEntropy]]. The
  * explode(split(text, '')) form it replaces pushes EVERY CHARACTER of
  * the corpus through the aggregate as its own row (~10⁹ rows at sf10
  * for a ≤hundreds-key result); this collapses each document to its
  * ≤|alphabet| distinct characters map-side, so the per-char explode
  * multiplies |docs|·|alphabet|, not corpus bytes.
  *
  * Semantics match the split form exactly: iteration is by CODE POINT
  * (Java's zero-width split never lands inside a surrogate pair, so
  * split('') yields code points too), each key is the code point's
  * 1-char string, and an empty input yields an empty map (the split
  * form's lone empty-string token was filtered by length(ch) = 1).
  * ASCII counts ride a 128-slot array; anything above falls into a
  * hash map — same output either way.
  */
case class CharCountsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "graft_char_counts"

  override protected def nullSafeEval(a: Any): Any =
    CharCounts.ofUTF8(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharCounts.ofUTF8($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharCounts {

  /** One-pass code-point histogram; insertion order is ASCII slots
    * first then first-seen for the rest — irrelevant downstream (the
    * map is exploded into an aggregation).
    */
  def ofUTF8(s: UTF8String): MapData = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var other: java.util.LinkedHashMap[Int, Long] = null
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.LinkedHashMap[Int, Long]()
        val prev = other.get(cp)
        other.put(cp, (if (prev == null) 0L else prev.longValue()) + 1L)
      }
      i += Character.charCount(cp)
    }
    var n = 0
    var c = 0
    while (c < 128) { if (ascii(c) > 0L) n += 1; c += 1 }
    if (other != null) n += other.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var k = 0
    c = 0
    while (c < 128) {
      if (ascii(c) > 0L) {
        keys(k) = UTF8String.fromString(String.valueOf(c.toChar))
        vals(k) = ascii(c)
        k += 1
      }
      c += 1
    }
    if (other != null) {
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        keys(k) = UTF8String.fromString(
          new String(Character.toChars(e.getKey.intValue())))
        vals(k) = e.getValue.longValue()
        k += 1
      }
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  def of(text: Column): Column =
    GraftShim.column(CharCountsExpr(GraftShim.expression(text)))
}
