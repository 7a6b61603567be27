package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Mutable (found, score, key) triple — 17 serialized bytes. */
final class ArgMaxState(
    var found: Boolean = false,
    var s: Double = 0.0,
    var k: Long = 0L)

/** Native argmax — max over the lexicographic (score, key) pair,
  * returned as struct<s:double, k:bigint> (callers pass key = -j to
  * get "highest score, ties to smallest j", exactly like the
  * max(struct(score, -j)) idiom it replaces on hot paths).
  *
  * Why it exists: the built-in max over a STRUCT plans as
  * SortAggregate — a struct-typed agg buffer is not mutable
  * fixed-width, so HashAggregate refuses it and every partition
  * SORTS its full input stream before the partial aggregation. At
  * sf0.1 that is invisible; on the 625M-pair bm25 dense scan at sf1
  * the partial-agg sort spilled tens of GB and dominated the query
  * (~9 min). This TypedImperativeAggregate plans as
  * ObjectHashAggregate: hash-based partial with one 17-byte state
  * per group per task, no sort anywhere, and the shuffle carries one
  * partial buffer per (task, group) — the shape the 100-TB argmax
  * needs. Update/merge are branch-only (no allocation); semantics
  * are EXACTLY the struct-max's lexicographic order, so swapping it
  * in cannot change results.
  */
case class ArgMaxAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxState]
  with BinaryLike[Expression] {

  override def createAggregationBuffer(): ArgMaxState = new ArgMaxState()

  override def update(buf: ArgMaxState, input: InternalRow): ArgMaxState = {
    val sv = left.eval(input)
    val kv = right.eval(input)
    if (sv != null && kv != null)
      consider(buf, sv.asInstanceOf[Double], kv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: ArgMaxState, other: ArgMaxState): ArgMaxState = {
    if (other.found) consider(buf, other.s, other.k)
    buf
  }

  private def consider(buf: ArgMaxState, s: Double, k: Long): Unit = {
    // lexicographic (s, k) max, matching struct-max ordering (NaN
    // sorts above all values there, via java.lang.Double.compare)
    if (!buf.found) { buf.found = true; buf.s = s; buf.k = k }
    else {
      val c = java.lang.Double.compare(s, buf.s)
      if (c > 0 || (c == 0 && k > buf.k)) { buf.s = s; buf.k = k }
    }
  }

  override def eval(buf: ArgMaxState): Any =
    if (!buf.found) null
    else new GenericInternalRow(Array[Any](buf.s, buf.k))

  override def serialize(buf: ArgMaxState): Array[Byte] = {
    val bb = ByteBuffer.allocate(17)
    bb.put(if (buf.found) 1.toByte else 0.toByte)
    bb.putDouble(buf.s)
    bb.putLong(buf.k)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArgMaxState = {
    val bb = ByteBuffer.wrap(bytes)
    new ArgMaxState(bb.get() == 1, bb.getDouble, bb.getLong)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("s", DoubleType, nullable = false),
    StructField("k", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_argmax expects (DOUBLE score, BIGINT key), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxAgg =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_argmax"
}

object ArgMaxAgg {
  /** struct<s, k> of the lexicographic (score, key) max — drop-in for
    * `max(struct(score, key))` on streams too large to sort.
    */
  def of(score: Column, key: Column): Column =
    GraftShim.column(ArgMaxAgg(
      GraftShim.expression(score), GraftShim.expression(key))
      .toAggregateExpression())
}
