package graft

import org.apache.spark.sql.functions._
import graft.functions.Skew

class ScaleToolsSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain-join rows with more tasks") {
    val c = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
      .withColumnRenamed("s_nationkey", "c_nationkey")
    val plain = c.join(s, Seq("c_nationkey"))
      .select("c_custkey", "s_suppkey").collect().toSet
    val salted = Skew.saltedJoin(c, s, Seq("c_nationkey"), col("c_custkey"), 8)
      .select("c_custkey", "s_suppkey").collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin under a planted hot key: straggler-free task histogram") {
    import spark.implicits._
    // planted skew: 90% of the left fact carries ONE key — the bot
    // user / boilerplate-lang shape. A plain equi-join lands 90% of
    // the probe work in a single task; the salted join must spread it
    // so no task holds more than a small multiple of the mean. This is
    // the plan shape dedup_ngram_jaccard runs in production via
    // Skew.saltedJoin (lang block key, cardinality ~5).
    val n = 20000
    val left = spark.range(n)
      .select(col("id"),
        when(col("id") % 10 < 9, lit("hot")).otherwise(concat(lit("k"),
          col("id") % 7)).as("k"))
    val right = (0 to 6).map(i => s"k$i").appended("hot").toDF("k")
      .withColumn("payload", lit(1))
    def partHist(df: org.apache.spark.sql.DataFrame): Seq[Int] =
      df.rdd.mapPartitions(it => Iterator(it.size)).collect().toSeq
    // disable auto-broadcast: the skew under test is the SHUFFLE
    // join's key partitioning (at fact×fact scale neither side
    // broadcasts), and a broadcast would hide it on this fixture
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE would merge this fixture's kilobyte partitions into one and
    // hide the histogram; at fact scale the partitions are far above
    // the advisory size and no coalescing happens. The spec session
    // runs 4 shuffle partitions — widen so the salt fan-out has tasks
    // to land on, as a real cluster would.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val salts = 32
      val plainHist = partHist(left.join(right, Seq("k")))
      val saltedHist = partHist(
        Skew.saltedJoin(left, right, Seq("k"), col("id"), salts))
      // same rows either way
      assert(saltedHist.sum == plainHist.sum && saltedHist.sum == n)
      // plain: the hot key's 90% sits in one task (the straggler)
      assert(plainHist.max >= (0.9 * n).toInt,
        s"skew fixture must concentrate: ${plainHist.sorted.reverse.take(3)}")
      // salted: the hot key fans out across `salts` (key, salt) shards
      // — the straggler task shrinks by at least 4x, no task keeps
      // more than a small slice of the total, and the work spreads
      // over many tasks instead of one per key
      assert(saltedHist.max <= plainHist.max / 4,
        s"straggler survived salting: ${saltedHist.max} vs plain ${plainHist.max}")
      assert(saltedHist.max.toDouble / n <= 0.2,
        s"one task still holds ${saltedHist.max * 100 / n}% of the join")
      assert(saltedHist.count(_ > 0) >= 16,
        s"expected wide fan-out, got ${saltedHist.count(_ > 0)} busy tasks")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  test("saltedCountDistinct is exact (equals plain countDistinct)") {
    val e = Tables.events(spark, sf)
    val plain = e.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_distinct"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedCountDistinct(e, Seq("event_type"), col("user_id"), 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("zvalue interleaves bits; z-write lays out disjoint z-ranges") {
    import spark.implicits._
    // spread(3)=0b0101, spread(5)<<1=0b100010 → 0b100111 = 39
    val z = Seq((3L, 5L)).toDF("x", "y")
      .select(graft.functions.ZOrder.zvalue(col("x"), col("y"))).head.getLong(0)
    assert(z == 39L, s"zvalue(3,5) = $z")
    // 64x64 grid, 4 z-range files: files must cover DISJOINT z-ranges
    // (that is the clustering property row-group pruning relies on;
    // the rectangle shape follows from Morton math)
    val dir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val grid = spark.range(64 * 64)
      .select((col("id") % 64).as("x"), expr("id div 64").as("y"))
    graft.sources.Sinks.writeZOrdered(grid, dir, "x", "y", 4)
    assert(spark.read.parquet(dir).count() == 64 * 64)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getPath)
        .select(graft.functions.ZOrder.zvalue(col("x"), col("y")).as("z"))
        .agg(min("z"), max("z")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"z-ranges overlap: $hi >= $lo")
      case _ =>
    }
  }

  test("compact rewrites many small files into few, preserving rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val df = Tables.nation(spark, sf)
    df.repartition(12).write.mode("overwrite").parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles >= 10)
    graft.sources.Sinks.compact(spark, dir, rowsPerFile = 1000)
    assert(parquetFiles == 1, s"$parquetFiles files after compaction")
    assert(spark.read.parquet(dir).count() == df.count())
  }

  test("PlanCache.invalidate drops entries for the named dir only") {
    val dirA = java.nio.file.Files.createTempDirectory("graft-pc-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-pc-b").toString
    Tables.nation(spark, sf).limit(3).write.mode("overwrite").parquet(dirA)
    Tables.nation(spark, sf).limit(5).write.mode("overwrite").parquet(dirB)
    var builds = 0
    def cachedCount(d: String): Long =
      PlanCache.cached("pc_test", spark, d) {
        builds += 1; spark.read.parquet(d)
      }.count()
    assert(cachedCount(dirA) == 3 && cachedCount(dirB) == 5)
    assert(builds == 2)
    cachedCount(dirA)
    assert(builds == 2, "second read must be a cache hit")
    // rewrite dirA, then invalidate: the entry must rebuild from the
    // new files; dirB's entry must survive untouched
    Tables.nation(spark, sf).limit(4).write.mode("overwrite").parquet(dirA)
    PlanCache.invalidate(dirA)
    assert(cachedCount(dirA) == 4, "invalidate must force a rebuild")
    assert(builds == 3)
    assert(cachedCount(dirB) == 5 && builds == 3, "other dirs keep their entries")
    PlanCache.invalidate(dirA); PlanCache.invalidate(dirB)
  }

  test("upsertJdbc rejects unsafe table identifiers") {
    import org.apache.spark.sql.functions.lit
    val df = Tables.nation(spark, sf).limit(1).withColumn("v", lit(1L))
    val props = new java.util.Properties()
    intercept[IllegalArgumentException] {
      graft.sources.Sinks.upsertJdbc(df, "jdbc:derby:memory:unused",
        "t; DROP TABLE x", Seq("n_nationkey"), "v", props)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a killed prior run can leave the managed location behind with
    // no catalog entry; saveAsTable then refuses the path
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    Tables.orders(spark, sf).write.bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located buckets: the join must not re-shuffle either side
    assert(!plan.contains("Exchange hashpartitioning"), plan.linesIterator.take(12).mkString("\n"))
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }
}
