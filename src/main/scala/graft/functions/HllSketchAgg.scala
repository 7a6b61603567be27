package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Shared HyperLogLog math for the native aggregate and the
  * compositional [[graft.operators.Sketches.approxDistinctHll]] —
  * ONE definition so the two engine paths and the DuckDB oracle
  * can't drift. Fixed geometry: p = 8 → m = 256 registers, hash =
  * the first 14 md5 nibbles as a 56-bit integer (register = top 8
  * bits, rank input = low 48 bits), rho = 49 − bitlength(low48)
  * (49 when the low bits are all zero). The register sum is kept as
  * the INTEGER Σ 2^(49−M_j) — exact and summation-order-free, unlike
  * the float Σ 2^−M_j — and the classic estimator divides it back:
  * E = α·m²·2^49 / isum, with the small-range linear-counting
  * correction E = m·ln(m/V) when E ≤ 2.5m and V empty registers
  * remain. Every arithmetic step is written in the same operand
  * order here, in the Column formulation, and in the oracle SQL, so
  * the estimate is bit-reproducible across engines.
  */
object Hll {
  val m = 256
  /** 2^49 — the integer register-sum scale. */
  val scale: Long = 562949953421312L

  def rho(low48: Long): Int =
    if (low48 == 0L) 49 else 49 - (64 - java.lang.Long.numberOfLeadingZeros(low48))

  /** isum = Σ_j 2^(49−M_j) over all m registers (M_j = 0 when empty);
    * zeros = count of empty registers.
    */
  def estimate(isum: Long, zeros: Int): Double = {
    val md = 256.0
    val eRaw = 0.7213 / (1.0 + 1.079 / 256.0) * md * md * 562949953421312.0 /
      isum.toDouble
    val e =
      if (eRaw <= 640.0 && zeros > 0) md * math.log(md / zeros.toDouble)
      else eRaw
    BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}

/** Native HLL(p=8) distinct-count sketch as a Catalyst
  * [[TypedImperativeAggregate]] — the constant-state counterpart to
  * [[KmvSketchAgg]]: per-group state is EXACTLY 256 bytes regardless
  * of cardinality (KMV's TreeSet is k boxed longs), update is two
  * shifts and a byte max, and merge is a bytewise max — the cheapest
  * possible map-side combine, which is why HLL is the industry
  * default for distinct counts over web-scale streams. Input is the
  * 56-bit deterministic hash `graft_hex_long(md5(x), 14)`, so the
  * estimate is engine-portable and the DuckDB oracle replays it
  * digit-for-digit (no RNG, no engine-private hash — the reason this
  * isn't a thin wrapper over Spark's own approx_count_distinct,
  * whose xxhash64/dense-HLL internals no oracle can mirror).
  *
  * Reference behavior: the entity/rollup counting the reference
  * keeps in Postgres (sql/schema_postgres.sql analytics rollups),
  * re-expressed sketch-first for 100-TB cardinalities.
  */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val reg = ((h >>> 48) & 0xffL).toInt
      val r = Hll.rho(h & 0xffffffffffffL)
      if (r > buf(reg)) buf(reg) = r.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < Hll.m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var isum = 0L
    var zeros = 0
    var i = 0
    while (i < Hll.m) {
      val mj = buf(i).toInt
      isum += (1L << (49 - mj))
      if (mj == 0) zeros += 1
      i += 1
    }
    Hll.estimate(isum, zeros)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll_distinct expects a BIGINT hash input, got ${child.dataType.sql}")

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_hll_distinct"
}
