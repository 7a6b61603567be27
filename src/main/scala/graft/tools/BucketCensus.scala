package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: band-bucket size census for the ngram LSH join at an
  * arbitrary SF dir — sizes the hot-bucket threshold and the
  * broadcast fallback before they are committed. Not part of the
  * driver contract.
  */
object BucketCensus {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dense = graft.Tables.documents(spark, dir)
      .filter(length(col("text")) >= 3)
      .withColumn("bs", graft.functions.NgramBitset.ngramBitset(col("text")))
      .select(col("doc_id"), col("lang"), col("bs.v").as("v"))
    val bands = dense.select(col("lang"),
      posexplode(graft.functions.BitsetMinhash.bandKeys(col("v"),
        graft.operators.Dedup.NgramLshBands,
        graft.operators.Dedup.NgramLshRows)).as(Seq("band_idx", "band_val")))
    val counts = bands.groupBy("lang", "band_idx", "band_val")
      .agg(count(lit(1)).as("bn"))
    counts.selectExpr(
        "CAST(round(log2(bn)) AS INT) AS log2_bn",
        "bn", "bn * (bn - 1) / 2 AS pairs")
      .groupBy("log2_bn")
      .agg(count(lit(1)).as("n_buckets"), sum("bn").as("rows"),
        sum("pairs").as("pairs"), max("bn").as("max_bn"))
      .orderBy("log2_bn")
      .show(40, false)
    spark.stop()
  }
}
