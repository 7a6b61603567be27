package graft.functions

import org.apache.spark.sql.functions._

/** Pins the native per-row char histogram ([[CharCounts]]) to the
  * explode(split(text,'')) + filter(length=1) + count form it replaced
  * in text_char_entropy: same (ch, count) multiset per input, for
  * ASCII, multi-byte, supplementary-plane and empty strings — and the
  * rewritten per-source aggregate must match the exploded original on
  * a real SF dir.
  */
class CharCountsSpec extends graft.SparkSpec {

  test("histogram equals the exploded split form on adversarial strings") {
    import spark.implicits._
    val rows = Seq(
      "plain ascii text 123",
      "repeated aaaa  bbbb",
      "accented ééè and ü",
      "cjk 漢字漢",
      "emoji 🎉🎉 pair",
      "",
      "x").toDF("text").withColumn("id", monotonically_increasing_id())

    val native = rows.select(col("id"),
        explode(CharCounts.of(col("text"))).as(Seq("ch", "c")))
    val split_ = rows.select(col("id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) === 1)
      .groupBy("id", "ch").agg(count(lit(1)).as("c"))
    assert(native.exceptAll(split_).isEmpty && split_.exceptAll(native).isEmpty)
  }

  test("text_char_entropy aggregate unchanged at sf0.001") {
    val now = graft.operators.TextAnalysis.textCharEntropy(spark, sf).collect()
    val doc = graft.Tables.documents(spark, sf)
    val counts = doc
      .select(col("source"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) === 1)
      .groupBy("source", "ch").agg(count(lit(1)).as("c"))
    val tot = counts.groupBy("source")
      .agg(sum("c").as("n_chars"), count(lit(1)).as("n_distinct"))
    val p = col("c").cast("double") / col("n_chars")
    val ref = counts.join(tot, "source")
      .withColumn("t_u9", round(-p * log2(p) * lit(1e9)).cast("long"))
      .groupBy("source", "n_chars", "n_distinct")
      .agg(sum("t_u9").as("s_u9"))
      .select(col("source"), col("n_chars"), col("n_distinct"),
        round(col("s_u9").cast("double") / 1e9, 6).as("entropy_bits"),
        round(col("s_u9").cast("double") / 1e9 / 8.0, 6)
          .as("est_compression_ratio"))
      .orderBy("source").collect()
    assert(now.toSeq == ref.toSeq)
  }
}
