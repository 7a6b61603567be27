package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Banded MinHash over a [[NgramBitset]] bitset, as ONE native
  * expression: `v: array<long>(128) → array<long>(bands)` of band
  * keys, where slot `j`'s minhash is the minimum over the bitset's
  * SET-BIT INDICES of a multiply-xorshift hash seeded per slot, and
  * each band key folds `rows` consecutive slots.
  *
  * This puts the LSH candidate generator in the SAME similarity
  * space the ngram-jaccard family SCORES in (char-trigram feature
  * bitset, 4096-bit universe): P(slot match) for a pair equals their
  * bitset jaccard exactly, so the banded catch probability
  * 1−(1−s^rows)^bands transfers to the measured candidate recall.
  * The r9 capped regime borrowed the word-3-shingle minhash bands
  * instead — a DIFFERENT similarity space, measured at 0.43 recall
  * against char-gram jaccard ≥ 0.8 where the curve promised 0.98
  * (RECALL_EVAL.json, sf1 forced regime) — exactly the plausible-but-
  * wrong composition this expression retires.
  *
  * Cost: set-bits × bands·rows multiply-xorshift rounds, map-side,
  * no shuffle; the 4096-bit universe caps set-bits, so the per-doc
  * cost is bounded at any document length.
  */
case class BitsetMinhashExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<long>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bitset_minhash"

  override protected def nullSafeEval(a: Any): Any =
    BitsetMinhash.bandKeys(a.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BitsetMinhash.bandKeys($c, $bands, $rows);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BitsetMinhash {

  /** Per-slot multiplier, derived once per slot count via SplitMix64
    * (public-domain mixer; Steele et al., "Fast Splittable
    * Pseudorandom Number Generators", OOPSLA 2014). Odd multipliers
    * keep the multiply a bijection on Z/2^64.
    */
  private def seeds(k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < k) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      out(i) = (z ^ (z >>> 31)) | 1L
      i += 1
    }
    out
  }

  // slot-seed table is tiny (bands·rows longs) and shared across all
  // tasks in the executor; keyed by k so tests can probe other shapes
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seedsFor(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, kk => seeds(kk))

  /** Raw minhash slots for a bitset — exposed for the statistical
    * spec (slot-agreement fraction of a pair estimates its jaccard).
    */
  def minhashSlots(words: Array[Long], k: Int): Array[Long] = {
    val a = seedsFor(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var w = 0
    while (w < words.length) {
      // NgramBitset layout: 32 bits used per long word
      var bits = words(w) & 0xffffffffL
      while (bits != 0L) {
        val idx = w * 32 + java.lang.Long.numberOfTrailingZeros(bits)
        bits &= bits - 1
        var j = 0
        while (j < k) {
          var h = (idx + 1L) * a(j)
          h ^= (h >>> 31)
          h &= Long.MaxValue // unsigned-free ordering
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      w += 1
    }
    mins
  }

  /** Band keys: fold `rows` consecutive slots per band with a 31-mix
    * so a band collides iff (w.h.p.) all its slots collide.
    */
  def bandKeys(v: ArrayData, bands: Int, rows: Int): GenericArrayData = {
    val words = v.toLongArray()
    val mins = minhashSlots(words, bands * rows)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L
      var r = 0
      while (r < rows) { acc = acc * 31L + mins(b * rows + r); r += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  def bandKeys(c: Column, bands: Int, rows: Int): Column =
    GraftShim.column(BitsetMinhashExpr(GraftShim.expression(c), bands, rows))

  /** True iff no band BEFORE `p` matches between the two signatures —
    * the minimal-band emission predicate of the LSH candidate join
    * (each colliding pair survives in exactly one band, so the join
    * needs no distinct). Static so both the interpreted and generated
    * paths share it; the HOF formulation (zip_with + slice + exists)
    * allocated three arrays per evaluation and measured ~10 µs/eval
    * interpreted — at the 985M band-match evals of the sf10 join the
    * single biggest bucket (12k docs, 75M pairs) sat on one thread
    * for ~12 minutes. This loop is ~ns-grade and codegen-inlined.
    */
  def noEarlierBandMatch(a: ArrayData, b: ArrayData, p: Int): Boolean = {
    var k = 0
    while (k < p) {
      if (a.getLong(k) == b.getLong(k)) return false
      k += 1
    }
    true
  }

  def noEarlierBandMatch(sigA: Column, sigB: Column, bandIdx: Column): Column =
    GraftShim.column(NoEarlierBandMatchExpr(GraftShim.expression(sigA),
      GraftShim.expression(sigB), GraftShim.expression(bandIdx)))
}

/** Codegen'd ternary predicate over (sig_a, sig_b, band_idx) — see
  * [[BitsetMinhash.noEarlierBandMatch]].
  */
case class NoEarlierBandMatchExpr(sigA: Expression, sigB: Expression,
    bandIdx: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = sigA
  override def second: Expression = sigB
  override def third: Expression = bandIdx

  override def checkInputDataTypes(): TypeCheckResult =
    (sigA.dataType, sigB.dataType, bandIdx.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<long>, array<long>, int), got $other")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_no_earlier_band_match"

  override protected def nullSafeEval(a: Any, b: Any, p: Any): Any =
    BitsetMinhash.noEarlierBandMatch(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, p) =>
      s"${ev.value} = graft.functions.BitsetMinhash.noEarlierBandMatch($a, $b, $p);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(sigA = newFirst, sigB = newSecond, bandIdx = newThird)
}
