package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for SCALE-VALIDATION runs: writes
  * an sf×`factor` copy of a testdata dir by unioning `factor` shifted
  * copies of every table (explode over a copy index — one pass per
  * table, no driver data).
  *
  * Design goals, in order:
  *  - every key space stays CONSISTENT (copy i shifts custkey /
  *    orderkey / partkey / suppkey / user_id / doc_id / vec_id by
  *    i·(max+1), so all FK joins land exactly as in the source —
  *    copies are disjoint subgraphs and join/aggregate outputs scale
  *    linearly);
  *  - copy 0 is the source VERBATIM;
  *  - near-duplicate structure does NOT leak across copies: document
  *    text gets a copy token spliced in every 5 words (breaks 3-word
  *    shingles and 5-gram overlap), embeddings get a small per-copy
  *    offset — so dedup/ANN workloads keep their per-copy candidate
  *    density instead of degenerating into one giant dup family;
  *  - entity names regenerate from the SHIFTED key (the generator's
  *    name = f(key) relationship holds), keeping match semantics.
  *
  * Known honest non-linearity (historical): the r8 fuzzy matcher
  * blocked customer×supplier on nationkey, whose 25 fixed blocks both
  * scale ×factor — quadratic block density, measured as the sf10
  * kill. The r9 multi-pass NAME block (prefix-2 ∪ suffix-4) keys on
  * regenerated names = f(shifted key), so block cardinality grows
  * with the register and per-block volume stays bounded — the scale
  * report should now show the matcher family near-linear.
  *
  * Usage: ScaleUp <inDir> <outDir> [factor=10]. Writes one parquet
  * dir per table under outDir.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession.local()
    scale(spark, in, out, factor)
    spark.stop()
  }

  private def copies(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("cp", explode(sequence(lit(0L), lit(factor - 1L))))

  private def span(spark: SparkSession, df: DataFrame, key: String): Long = {
    val m = df.agg(max(col(key))).head().getLong(0)
    m + 1
  }

  def scale(spark: SparkSession, in: String, out: String, factor: Int): Unit = {
    // Fine input splits raise read parallelism where the source's
    // row-group count allows it (openCost 0 so tiny files still
    // split); the real layout guarantee is wr()'s range-cluster —
    // see the note there.
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    val slices = math.max(spark.sparkContext.defaultParallelism, 16)
    def rd(t: String) = {
      val bytes = {
        val d = new java.io.File(s"$in/$t.parquet")
        val fs = Option(d.listFiles()).map(_.filter(_.isFile).map(_.length).sum)
        fs.getOrElse(0L) max d.length
      }
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        math.max(64L << 10, bytes / slices).toString)
      spark.read.parquet(s"$in/$t.parquet")
    }
    // Range-cluster each table on its primary key before the write:
    // the source row-group count caps input-split parallelism (a
    // 1-row-group source explodes into ONE task no matter the split
    // size), and a round-robin repartition restores parallelism but
    // SCRAMBLES key locality — measured downstream as a 60M-row
    // groupBy emitting ~60M partial-agg rows instead of ~15M (q18
    // 6 s → 51 s). Range + in-partition sort keeps every key's rows
    // adjacent (the generator's natural order) across `slices`
    // parallel writers; values are unchanged.
    def wr(df: DataFrame, t: String, key: String): Unit = {
      df.drop("cp")
        .repartitionByRange(slices, col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t -> ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    val cSpan = span(spark, rd("customer"), "c_custkey")
    val sSpan = span(spark, rd("supplier"), "s_suppkey")
    val pSpan = span(spark, rd("part"), "p_partkey")
    val oSpan = span(spark, rd("orders"), "o_orderkey")
    val dSpan = span(spark, rd("documents"), "doc_id")
    val vSpan = span(spark, rd("embeddings"), "vec_id")
    val eSpan = span(spark, rd("events"), "event_id")
    val uSpan = span(spark, rd("events"), "user_id")

    // fixed dims pass through
    wr(rd("region").withColumn("cp", lit(0L)), "region", "r_regionkey")
    wr(rd("nation").withColumn("cp", lit(0L)), "nation", "n_nationkey")

    wr(copies(rd("customer"), factor)
      .withColumn("c_custkey", col("c_custkey") + col("cp") * cSpan)
      .withColumn("c_name", format_string("Customer#%09d", col("c_custkey"))),
      "customer", "c_custkey")

    wr(copies(rd("supplier"), factor)
      .withColumn("s_suppkey", col("s_suppkey") + col("cp") * sSpan)
      .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey"))),
      "supplier", "s_suppkey")

    wr(copies(rd("part"), factor)
      .withColumn("p_partkey", col("p_partkey") + col("cp") * pSpan),
      "part", "p_partkey")

    wr(copies(rd("orders"), factor)
      .withColumn("o_orderkey", col("o_orderkey") + col("cp") * oSpan)
      .withColumn("o_custkey", col("o_custkey") + col("cp") * cSpan),
      "orders", "o_orderkey")

    wr(copies(rd("lineitem"), factor)
      .withColumn("l_orderkey", col("l_orderkey") + col("cp") * oSpan)
      .withColumn("l_partkey", col("l_partkey") + col("cp") * pSpan)
      .withColumn("l_suppkey", col("l_suppkey") + col("cp") * sSpan),
      "lineitem", "l_orderkey")

    // events: copies are disjoint user populations on the SAME
    // timeline — 10x traffic density, the realistic growth axis.
    // ts is TIMESTAMP(NANOS) in the source, which this session reads
    // as long nanos; rewrite as µs-precision NTZ timestamps (all
    // operators consume second granularity via ts_s).
    val ev = copies(rd("events"), factor)
      .withColumn("event_id", col("event_id") + col("cp") * eSpan)
      .withColumn("user_id", col("user_id") + col("cp") * uSpan)
    val evTs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        ev.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => ev
    }
    wr(evTs, "events", "event_id")

    // documents: splice a copy token in every 5 words for copies > 0
    // so cross-copy shingle/5-gram overlap dies while per-copy
    // near-dup structure survives; n_chars tracks the mutated text
    wr(copies(rd("documents"), factor)
      .withColumn("doc_id", col("doc_id") + col("cp") * dSpan)
      .withColumn("text",
        when(col("cp") === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("((?:\\S+\\s+){5})"),
            concat(lit("$1zq"), col("cp"), lit(" ")))))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents", "doc_id")

    // embeddings: small deterministic per-copy offset breaks exact
    // vector duplication without moving the distribution
    wr(copies(rd("embeddings"), factor)
      .withColumn("vec_id", col("vec_id") + col("cp") * vSpan)
      .withColumn("embedding",
        transform(col("embedding"),
          x => (x + col("cp").cast("float") * lit(0.001f)).cast("float"))),
      "embeddings", "vec_id")
  }
}
