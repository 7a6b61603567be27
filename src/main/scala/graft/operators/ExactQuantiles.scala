package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT interpolated percentiles with BOUNDED aggregation state.
  *
  * Spark's exact `percentile()` aggregate buffers every value of the
  * group inside one aggregation buffer (an in-memory counts map per
  * group): per-type percentiles over a fact table put corpus/|types|
  * doubles into a single task's buffer — the one aggregate shape that
  * cannot survive a 100× scale-up. This helper reproduces the exact
  * interpolated result (identical math to Spark's
  * `Percentile.getPercentile` / DuckDB's `quantile_cont`) from a
  * TWO-PASS broadcast-bin plan in which every aggregation carries
  * constant-size state and every window runs over a bounded relation:
  *
  *  1. per-group extent (count/min/max) — O(1) state, broadcast;
  *  2. per-(group, bin) histogram over `nBins` equi-width value bins —
  *     map-side combinable, ≤ |groups|·nBins keys;
  *  3. cumulative bin counts (a window over the ≤ |groups|·nBins-row
  *     histogram, NOT over the data) locate, for each requested
  *     percentile, the two bracketing global ranks and the bin each
  *     falls in;
  *  4. single-valued bins (bin_min == bin_max) resolve ranks with no
  *     second read; otherwise a row_number ranks ONLY the rows of the
  *     few target bins (expected |data|·|ranks|/nBins rows, each
  *     window partition one bin ≈ |group|/nBins rows);
  *  5. interpolate `(1−frac)·v_lo + frac·v_hi` — Spark's exact form.
  *
  * Degenerate distributions where one bin still holds many DISTINCT
  * values (all mass inside a 1/nBins slice of the range) widen step 4;
  * with nBins=4096 the residual partition is data/4096 of the group —
  * three orders of magnitude off the `percentile()` buffer, and
  * spill-safe (sort-based window) rather than OOM-bound.
  *
  * Returns one row per (group, p): `groupCols :+ ("p", "q")`. With no
  * group columns, a single row per p.
  *
  * REGIME GATE (same discipline as graph_triangles' measured edge
  * cap): the broadcast-bin plan is ~15 Spark stages; at small scale
  * its fixed per-stage cost dwarfs the work, while native
  * `percentile()` is one stage and its buffer is PROVABLY bounded
  * whenever the largest group is measured small. So the plan is
  * chosen on a MEASURED per-group value count: groups ≤
  * `maxNativeGroupValues` (default 4M values ≈ 32 MB buffer) run the
  * native aggregate; anything larger takes the bounded-state bin
  * plan. The gate itself is a constant-state count aggregate, and
  * both regimes produce bit-identical results (ExactQuantilesSpec
  * pins equality; PlanAuditSpec pins the above-cap plan shape).
  */
object ExactQuantiles {
  def percentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  ps: Seq[Double], nBins: Int = 4096,
                  maxNativeGroupValues: Long = 4000000L): DataFrame = {
    if (maxNativeGroupValues > 0) {
      val gate = (if (groupCols.nonEmpty) df.groupBy(groupCols.map(col): _*)
        else df.groupBy())
        .agg(count(col(valueCol)).as("_eq_gn"))
        .agg(max("_eq_gn")).head()
      val maxN = if (gate.isNullAt(0)) 0L else gate.getLong(0)
      if (maxN <= maxNativeGroupValues)
        return nativePercentiles(df, groupCols, valueCol, ps)
    }
    binnedPercentiles(df, groupCols, valueCol, ps, nBins)
  }

  /** Sub-cap regime: Spark's native exact percentile, reshaped to the
    * long (group, p, q) contract. Only reachable when the measured
    * largest group fits one aggregation buffer.
    */
  private def nativePercentiles(df: DataFrame, groupCols: Seq[String],
                                valueCol: String, ps: Seq[Double]): DataFrame = {
    val arr = s"array(${ps.mkString(", ")})"
    val agg0 = if (groupCols.nonEmpty) df.groupBy(groupCols.map(col): _*)
      else df.groupBy()
    agg0.agg(expr(s"percentile($valueCol, $arr)").as("_eq_qs"))
      .select(groupCols.map(col) :+ posexplode(col("_eq_qs")): _*)
      .select(groupCols.map(col) :+
        element_at(array(ps.map(lit): _*), col("pos") + 1).as("p") :+
        col("col").as("q"): _*)
  }

  private def binnedPercentiles(df: DataFrame, groupCols: Seq[String],
                                valueCol: String, ps: Seq[Double],
                                nBins: Int): DataFrame = {
    val gcols = if (groupCols.nonEmpty) groupCols else Seq("_eq_g")
    val g = gcols.map(col)
    val base0 = df
      .select(groupCols.map(col) :+ col(valueCol).cast("double").as("_eq_v"): _*)
      .filter(col("_eq_v").isNotNull)
    val base =
      if (groupCols.nonEmpty) base0 else base0.withColumn("_eq_g", lit(0))

    // pass 0: per-group extent — constant aggregation state
    val ext = base.groupBy(g: _*).agg(
      count(lit(1)).as("_eq_n"),
      min("_eq_v").as("_eq_min"), max("_eq_v").as("_eq_max"))

    // deterministic, monotonic bin id; v == max folds into the last bin
    val bin = when(col("_eq_max") <= col("_eq_min"), lit(0L)).otherwise(least(
      floor((col("_eq_v") - col("_eq_min"))
        / (col("_eq_max") - col("_eq_min")) * nBins).cast("long"),
      lit(nBins - 1L)))
    val withB = base.join(broadcast(ext), gcols).withColumn("_eq_b", bin)

    // pass 1: bounded histogram — ≤ |groups|·nBins keys, map-side combine
    val hist = withB.groupBy(g :+ col("_eq_b"): _*).agg(
      count(lit(1)).as("_eq_c"),
      min("_eq_v").as("_eq_bmin"), max("_eq_v").as("_eq_bmax"))

    // cumulative counts over the HISTOGRAM via a two-level prefix sum:
    // an intra-chunk running sum (window partitioned by (group, chunk)
    // — never an unpartitioned window, even for global quantiles) plus
    // a bounded chunk-triangle join for the earlier chunks' mass. Both
    // levels run over ≤ |groups|·nBins histogram rows, not the data.
    val chunkSize = math.max(1, nBins / 64)
    val withCh = hist.withColumn("_eq_ch", (col("_eq_b") / chunkSize).cast("long"))
    val wIntra = Window.partitionBy(g :+ col("_eq_ch"): _*).orderBy("_eq_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = withCh.withColumn("_eq_intra",
      coalesce(sum("_eq_c").over(wIntra), lit(0L)))
    val chTot = withCh.groupBy(g :+ col("_eq_ch"): _*)
      .agg(sum("_eq_c").as("_eq_chc"))
    // global quantiles fold the constant group key out of the join —
    // broadcast the ≤64-row chunk totals so the triangle never plans
    // as a cartesian (grouped runs keep the plain equi-join: hinting
    // would force a |groups|·64-row broadcast)
    val chTot2 = chTot.select(g :+ col("_eq_ch").as("_eq_ch2") :+
      col("_eq_chc").as("_eq_chc2"): _*)
    val chBefore = chTot
      .join(if (groupCols.isEmpty) broadcast(chTot2) else chTot2, gcols)
      .filter(col("_eq_ch2") < col("_eq_ch"))
      .groupBy(g :+ col("_eq_ch"): _*).agg(sum("_eq_chc2").as("_eq_chbefore"))
    val cum = intra.join(chBefore, gcols :+ "_eq_ch", "left")
      .withColumn("_eq_before",
        col("_eq_intra") + coalesce(col("_eq_chbefore"), lit(0L)))

    // bracketing 1-based global ranks of each requested percentile,
    // matching Spark's position = p·(n−1) interpolation exactly
    val targets = ext
      .withColumn("_eq_p", explode(array(ps.map(lit): _*)))
      .withColumn("_eq_pos", col("_eq_p") * (col("_eq_n") - 1).cast("double"))
      .withColumn("_eq_klo", (floor(col("_eq_pos")) + 1).cast("long"))
      .withColumn("_eq_frac", col("_eq_pos") - floor(col("_eq_pos")))
      .withColumn("_eq_khi",
        when(col("_eq_frac") > 0, col("_eq_klo") + 1).otherwise(col("_eq_klo")))
    val ranks = targets.select(g :+ col("_eq_klo").as("_eq_k"): _*)
      .union(targets.select(g :+ col("_eq_khi").as("_eq_k"): _*))
      .distinct()

    // locate each rank's bin: rows before it < k ≤ rows through it
    val located = ranks.join(cum, gcols)
      .filter(col("_eq_k") > col("_eq_before") &&
        col("_eq_k") <= col("_eq_before") + col("_eq_c"))
      .select(g :+ col("_eq_k") :+ col("_eq_b") :+
        (col("_eq_k") - col("_eq_before")).as("_eq_j") :+
        col("_eq_bmin") :+ col("_eq_bmax"): _*)

    // single-valued bins need no second read: the j-th value IS bmin
    val trivial = located.filter(col("_eq_bmin") === col("_eq_bmax"))
      .select(g :+ col("_eq_k") :+ col("_eq_bmin").as("_eq_vk"): _*)
    val need = located.filter(col("_eq_bmin") =!= col("_eq_bmax"))

    // pass 2: rank only the target bins' rows; each window partition
    // is one (group, bin) — |group|/nBins rows, spill-safe
    val needBuckets = need.select(g :+ col("_eq_b"): _*).distinct()
    val wr = Window.partitionBy(g :+ col("_eq_b"): _*).orderBy("_eq_v")
    val found = withB.join(broadcast(needBuckets), gcols :+ "_eq_b")
      .withColumn("_eq_rn", row_number().over(wr))
      .join(broadcast(need.select(g :+ col("_eq_b") :+ col("_eq_j") :+
        col("_eq_k"): _*)), gcols :+ "_eq_b")
      .filter(col("_eq_rn") === col("_eq_j"))
      .select(g :+ col("_eq_k") :+ col("_eq_v").as("_eq_vk"): _*)
    val atK = trivial.unionByName(found)

    val vlo = atK.select(g :+ col("_eq_k").as("_eq_klo") :+
      col("_eq_vk").as("_eq_vlo"): _*)
    val vhi = atK.select(g :+ col("_eq_k").as("_eq_khi") :+
      col("_eq_vk").as("_eq_vhi"): _*)
    targets.join(vlo, gcols :+ "_eq_klo").join(vhi, gcols :+ "_eq_khi")
      // Spark's Percentile short-circuits equal bracketing values (no
      // FP round-off) and otherwise uses (1−frac)·lo + frac·hi — keep
      // the identical expressions so results hash-match
      .withColumn("_eq_q", when(col("_eq_vlo") === col("_eq_vhi"), col("_eq_vlo"))
        .otherwise((lit(1.0) - col("_eq_frac")) * col("_eq_vlo")
          + col("_eq_frac") * col("_eq_vhi")))
      .select(groupCols.map(col) :+ col("_eq_p").as("p") :+
        col("_eq_q").as("q"): _*)
  }
}
