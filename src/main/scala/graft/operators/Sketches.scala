package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distinct-count sketches for corpus statistics at scale. HLL is the
  * usual tool, but its hash is engine-specific; KMV (k minimum
  * values) over an md5-derived uniform hash is deterministic and
  * engine-portable, so the DuckDB oracle reproduces the estimate
  * bit-for-bit. Estimator: m distinct values hashed U(0,1) put the
  * k-th smallest hash at E[u_k] ≈ k/(m+1), so m̂ = (k-1)/u_k.
  */
object Sketches {

  /** Per-language distinct-token count: exact vs KMV(k=64) estimate.
    * The sketch path never holds more than k rows per group
    * (TopKPerGroup bounded heaps — no per-group sort, no window), so
    * the same plan sketches a trillion-token corpus; the exact
    * countDistinct rides along as the verification baseline.
    */
  def approxDistinctKmv(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), "\\s+")).as("token"))
      .distinct()
    // uniform hash in [0,1): first 8 md5 nibbles, parsed by the
    // native codegen'd graft_hex_long — exact in doubles at this
    // magnitude, digit-for-digit identical to the oracle's positional
    // nibble sum
    val hashed = toks
      .withColumn("u", graft.functions.HexExprs.uniformHash(col("token")))
    val kept = graft.plans.TopKPerGroup(
      hashed.select(col("lang"), col("u"), col("token")),
      Seq("lang"), Seq(("u", false), ("token", false)), k)
    val est = kept.groupBy("lang").agg(max("u").as("uk"), count(lit(1)).as("m"))
      .select(col("lang"),
        when(col("m") < k, col("m").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) / col("uk"), 6))
          .as("approx_distinct"))
    val exact = toks.groupBy("lang").agg(count(lit(1)).as("n_exact"))
    exact.join(est, "lang")
      .select(col("lang"), col("n_exact"), col("approx_distinct"))
      .orderBy("lang")
  }

  /** The same per-language KMV estimate through the native
    * [[graft.functions.KmvSketchAgg]] aggregate — the production
    * shape: per-group state is a bounded k-long sketch, partial
    * buffers combine MAP-SIDE, and the shuffle moves one sketch per
    * (mapper, group) instead of the k candidate rows + a second
    * aggregation that the TopKPerGroup formulation needs. The
    * estimate is deterministic (same md5-nibble hash), so the DuckDB
    * oracle replays it exactly; the exact distinct rides along.
    */
  def approxDistinctKmvAgg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), "\\s+")).as("token"))
    val h = graft.functions.HexExprs.hexPrefixLong(md5(col("token")), 8)
    val kmv = GraftShim.column(
      graft.functions.KmvSketchAgg(GraftShim.expression(h), 64)
        .toAggregateExpression())
    toks.groupBy("lang")
      .agg(kmv.as("approx_distinct"), countDistinct("token").as("n_exact"))
      .select("lang", "approx_distinct", "n_exact")
      .orderBy("lang")
  }

  /** Quantiles by deterministic hash sampling: exact percentiles on
    * a content-hash 10% sample vs the exact full-data percentiles,
    * with the absolute error alongside — the scalable-quantile
    * pattern when a full sort/exact-percentile pass is too expensive:
    * the sample is a pure map-side filter (no coordinated sampling
    * state, reproducible across runs and engines), and the exact
    * columns double as the built-in error verification, the same
    * sketch-vs-truth shape as [[heavyHittersCms]].
    */
  def approxQuantilesSampled(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.PlanCache.cached("aq_events", spark, dir) {
      Tables.events(spark, dir).select(
        col("event_type"), col("value"),
        graft.functions.HexExprs.uniformHash(col("event_id").cast("string")).as("u"))
    }
    val full = e.groupBy("event_type").agg(
      round(expr("percentile(value, 0.5)"), 6).as("p50_exact"),
      round(expr("percentile(value, 0.9)"), 6).as("p90_exact"),
      round(expr("percentile(value, 0.99)"), 6).as("p99_exact"))
    val samp = e.filter(col("u") < 0.1).groupBy("event_type").agg(
      count(lit(1)).as("n_sample"),
      round(expr("percentile(value, 0.5)"), 6).as("p50_est"),
      round(expr("percentile(value, 0.9)"), 6).as("p90_est"),
      round(expr("percentile(value, 0.99)"), 6).as("p99_est"))
    full.join(samp, "event_type")
      .withColumn("p50_err", round(abs(col("p50_est") - col("p50_exact")), 6))
      .withColumn("p90_err", round(abs(col("p90_est") - col("p90_exact")), 6))
      .orderBy("event_type")
  }

  /** The CMS bucket derivation — d rows per input row, bucket = first
    * 2 md5 hex chars of "row|token" (a STRING key, so the oracle
    * mirrors it with no numeric hex conversion). ONE definition
    * shared by the batch sketch below and the streaming sketch
    * (graft.streaming.EventStreams.cmsSketchStream): parity between
    * the two is structural, not copy-paste.
    */
  def cmsBuckets(tokens: DataFrame, d: Int = 4): DataFrame =
    tokens
      .withColumn("row", explode(expr(s"sequence(0, ${d - 1})")))
      .withColumn("bucket",
        substring(md5(concat(col("row"), lit("|"), col("token"))), 1, 2))

  /** Count-Min-Sketch heavy hitters: the CMS estimate for the top-20
    * corpus tokens, with the exact count alongside as the baseline.
    * The sketch is d=4 hash rows × w=256 buckets; estimate = min over
    * rows of the bucket sum, which can only OVER-count (collisions
    * add), never under — `cms_est >= n_exact` is an invariant.
    *
    * Scale shape: the sketch is built from the per-token count
    * aggregate (d small rows per DISTINCT token, not per occurrence)
    * and is a FIXED d·w = 1024 rows regardless of corpus size — the
    * whole point of CMS: frequency queries over an unbounded stream
    * in constant space. The candidate probe joins 20·d rows against
    * it broadcast-style; nothing here grows with the data except the
    * one exact count aggregation used for verification — and that
    * aggregate is PlanCache'd because both the sketch branch and the
    * top-20 branch read it.
    */
  def heavyHittersCms(spark: SparkSession, dir: String): DataFrame = {
    val exact = graft.PlanCache.cached("cms_exact", spark, dir) {
      Tables.documents(spark, dir)
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n_exact"))
    }
    // d bucket rows per distinct token; bucket sums = occurrence mass
    val sketch = cmsBuckets(exact.select(col("token"), col("n_exact")))
      .groupBy("row", "bucket").agg(sum("n_exact").as("bsum"))
    val top = graft.functions.TopK.globalWithRank(
      exact, 20, col("n_exact").desc, col("token"))
    cmsBuckets(top.select(col("token"), col("n_exact"), col("rank")))
      .join(broadcast(sketch), Seq("row", "bucket")) // sketch is a fixed 1024 rows
      .groupBy("token", "n_exact", "rank")
      .agg(min("bsum").as("cms_est"))
      .select("rank", "token", "n_exact", "cms_est")
      .orderBy("rank")
  }
}
