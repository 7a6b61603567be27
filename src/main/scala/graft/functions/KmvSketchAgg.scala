package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native KMV (k-minimum-values) distinct-count sketch as a true
  * Catalyst [[TypedImperativeAggregate]] — the production shape for
  * approximate distinct at 100 TB: per-group state is a bounded set
  * of the k smallest UNIQUE hash values (k longs, constant), partial
  * buffers combine map-side, and merge is a k-bounded set union, so
  * the shuffle carries one ≤k-long sketch per group per mapper
  * instead of the raw values.
  *
  * The input is expected to be an already-uniform hash in
  * [0, 16^8) — compose with `graft_hex_long(md5(x), 8)` — which keeps
  * the estimate deterministic and cross-engine reproducible (the
  * DuckDB oracle replays the identical positional-nibble math; no
  * RNG, no engine-specific HLL). Estimate: m if m < k (the sketch
  * saw every distinct value), else (k-1) / u_k with u_k the k-th
  * smallest normalized hash, rounded to 6 so summation-order float
  * drift can't flip the hash gate.
  *
  * Reference behavior: entity counting/stats the reference keeps in
  * Postgres (sql/schema_postgres.sql analytics rollups), re-expressed
  * as a sketch so it survives web-corpus cardinalities.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 1 && k <= 65536, s"graft_kmv_distinct k must be in (1, 65536], got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // keep only the k smallest unique values; reject early when full
    // and v is already above the current k-th minimum
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val m = buf.size()
    if (m < k) m.toDouble
    else {
      val uk = buf.last().toLong.toDouble / math.pow(16.0, 8)
      BigDecimal((k - 1).toDouble / uk)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size() * 8)
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_distinct expects a BIGINT hash input, got ${child.dataType.sql}")

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_kmv_distinct"
}
