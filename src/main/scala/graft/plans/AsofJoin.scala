package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.LongType

/** As-of join as a first-class Catalyst operator: for each left row,
  * attach the right row with the same key that is nearest in time in
  * the requested DIRECTION — "latest prior" (backward: price as-of
  * trade, signup as-of purchase), "earliest at-or-after" (forward:
  * next fill after an order, next view after a purchase), or the
  * closer of the two (nearest) — optionally within a numeric
  * TOLERANCE on the first time attribute (the pandas `merge_asof`
  * surface).
  *
  * Spark has no built-in as-of join; the usual encodings are a range
  * join (O(n·m) per key after an inequality-join explosion) or a
  * union + window pass that drags BOTH sides' full rows through one
  * sort. This operator instead requires co-partitioning on the key
  * and (key, time) sort within partitions — the same distribution a
  * SortMergeJoin asks for — and then streams both sides through a
  * single forward-only merge: O(n+m) per partition, constant memory
  * (one buffered candidate per direction), no candidate-pair blowup,
  * in EVERY direction (forward and nearest reuse the same one-pass
  * state; the direction only changes which buffered candidate wins).
  * That is the shape that survives a 100 TB event log.
  *
  * Tolerance gates the found match (out-of-tolerance → null-extended,
  * exactly pandas' semantics — it never falls back to a farther row),
  * and requires the FIRST time attribute to be numeric (bigint);
  * the remaining time attributes only break ties.
  */
case class AsofJoinPlan(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Seq[Attribute], rightTime: Seq[Attribute],
                        left: LogicalPlan, right: LogicalPlan,
                        direction: String = "backward",
                        toleranceFirst: Long = Long.MaxValue) extends BinaryNode {
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of key types must match across sides")
  require(leftTime.map(_.dataType) == rightTime.map(_.dataType),
    "as-of time types must match across sides")
  require(Seq("backward", "forward", "nearest").contains(direction),
    s"as-of direction must be backward/forward/nearest, got $direction")
  require((toleranceFirst == Long.MaxValue && direction != "nearest") ||
      leftTime.head.dataType == LongType,
    "tolerance and nearest need a BIGINT first time attribute")
  require(toleranceFirst >= 0, "tolerance must be non-negative")
  // left-outer semantics: right side is null-extended on no match
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(lk, rk, lt, rt, l, r, dir, tol) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), dir, tol) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Seq[Attribute], rightTime: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan,
                        direction: String, toleranceFirst: Long)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key (EnsureRequirements inserts
  // compatible hash exchanges, exactly as for a SortMergeJoin) ...
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  // ... and sort each partition by (key, time) so the merge is a
  // single forward pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((leftKeys ++ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys ++ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val outAttrs = output
    val dir = direction
    val tol = toleranceFirst
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(lt, lOut)
      val rTimeProj = UnsafeProjection.create(rt, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(lt.map(_.dataType))
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      var rRow: InternalRow = null // fetched but not yet consumed
      var lastMatch: InternalRow = null // latest right row ≤ current left
      var lastMatchKey: InternalRow = null
      lIter.map { l =>
        val lKey = lKeyProj(l)
        if (lastMatch != null && keyOrd.compare(lastMatchKey, lKey) != 0) {
          lastMatch = null; lastMatchKey = null
        }
        val lTime = lTimeProj(l)
        var advancing = true
        while (advancing) {
          if (rRow == null && rIter.hasNext) rRow = rIter.next()
          if (rRow == null) advancing = false
          else {
            val cmp = keyOrd.compare(rKeyProj(rRow), lKey)
            if (cmp < 0) {
              // right key already below every remaining left key — drop
              rRow = null
            } else if (cmp == 0 && timeOrd.compare(rTimeProj(rRow), lTime) <= 0) {
              // at-or-before; later ones overwrite (we want the latest)
              lastMatch = rRow.copy()
              lastMatchKey = lKey.copy()
              rRow = null
            } else advancing = false
          }
        }
        // post-loop state: lastMatch = latest right ≤ lTime for this
        // key (if any); rRow = the first right strictly beyond —
        // either a bigger key, or this key's earliest time > lTime
        // (the forward candidate). rRow is NEVER consumed by a
        // forward emit: the same right row can be the next-after
        // match of many left rows.
        val fwdOk = rRow != null && keyOrd.compare(rKeyProj(rRow), lKey) == 0
        // "at-or-after" includes an exact composite-time tie, which
        // the backward scan has already consumed into lastMatch
        val backIsTie = lastMatch != null &&
          timeOrd.compare(rTimeProj(lastMatch), lTime) == 0
        def backDist =
          lTime.getLong(0) - rTimeProj(lastMatch).getLong(0)
        def fwdDist =
          rTimeProj(rRow).getLong(0) - lTime.getLong(0)
        val chosen = dir match {
          case "backward" =>
            if (lastMatch != null &&
              (tol == Long.MaxValue || backDist <= tol)) lastMatch else null
          case "forward" =>
            if (backIsTie) lastMatch
            else if (fwdOk && (tol == Long.MaxValue || fwdDist <= tol)) rRow
            else null
          case _ => // nearest: closer side wins, tie → backward
            val b = lastMatch != null && backDist <= tol
            val f = fwdOk && fwdDist <= tol
            if (b && (!f || backDist <= fwdDist)) lastMatch
            else if (f) rRow
            else null
        }
        outProj(joined(l, if (chosen != null) chosen else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Public API: left as-of-join right on equal keys, right time
  * at-or-before (backward, default), at-or-after (forward), or
  * closest (nearest) relative to left time; composite times compare
  * lexicographically — include a unique id to make ties
  * deterministic. `tolerance` bounds |Δ| on the FIRST time attribute
  * (bigint) and gates the found match without falling back. Column
  * names must be disjoint across sides (alias the right side first).
  */
object AsofJoin {
  def apply(left: DataFrame, right: DataFrame,
            leftOn: Seq[String], rightOn: Seq[String],
            leftTime: Seq[String], rightTime: Seq[String],
            direction: String = "backward",
            tolerance: Long = Long.MaxValue): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not in ${plan.output.map(_.name)}"))
    GraftShim.ofRows(left.sparkSession,
      AsofJoinPlan(
        leftOn.map(attr(lPlan, _)), rightOn.map(attr(rPlan, _)),
        leftTime.map(attr(lPlan, _)), rightTime.map(attr(rPlan, _)),
        lPlan, rPlan, direction, tolerance))
  }
}
