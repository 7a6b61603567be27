package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection for large text/embedding corpora — the
  * LLM-training-data operators layered on the reference's dedup
  * steps (clean_abr.py drop_duplicates; entity matching similarity).
  *
  * Scale design: every variant computes per-row signatures map-side
  * (no shuffle), then finds candidate pairs through a bounded
  * equi-join (hash bucket / LSH band / lang block) — never a corpus
  * cartesian. Verification (exact jaccard / cosine) runs only on
  * candidates.
  */
object Dedup {

  /** Exact dedup families by content hash: one row per distinct text,
    * keeper = min doc_id (clean_abr.py:34 drop_duplicates).
    */
  def dedupExactText(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_docs"))
      .orderBy("keeper")

  private def tokensCol = split(col("text"), "\\s+")

  /** Distinct 3-word shingles of the document text. */
  private def shinglesCol = array_distinct(expr(
    "transform(sequence(1, size(toks)-2), i -> array_join(slice(toks, i, 3), ' '))"))

  /** MinHash + LSH: 8 md5-derived minhashes per doc (map-side), 4
    * bands of 2 → band-bucket equi-join → candidates → exact jaccard
    * ≥ 0.8 verify. Band width bounds bucket sizes at any corpus size.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .withColumn("toks", tokensCol)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), shinglesCol.as("s"))
    val withH = (1 to 8).foldLeft(sh) { (d, j) =>
      d.withColumn(s"h$j",
        array_min(expr(s"transform(s, x -> substring(md5(concat('$j','|',x)), 1, 16))")))
    }
    val withBands = withH.select(col("doc_id"), col("s"),
      concat(col("h1"), col("h2")).as("b1"),
      concat(col("h3"), col("h4")).as("b2"),
      concat(col("h5"), col("h6")).as("b3"),
      concat(col("h7"), col("h8")).as("b4"))
    val bands = withBands.select(col("doc_id"),
      explode(map(lit(1), col("b1"), lit(2), col("b2"), lit(3), col("b3"), lit(4), col("b4")))
        .as(Seq("band_idx", "band_val")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    val sa = withBands.select(col("doc_id").as("i"), col("s").as("si"))
    val sb = withBands.select(col("doc_id").as("j"), col("s").as("sj"))
    cand.join(sa, "i").join(sb, "j")
      .withColumn("inter", size(array_intersect(col("si"), col("sj"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("si")) + size(col("sj")) - col("inter")), 6))
      .filter(col("jaccard") >= 0.8)
      .select("i", "j", "jaccard")
      .orderBy("i", "j")
  }

  /** 16-bit portable SimHash (md5-nibble bits, engine-agnostic
    * arithmetic): docs colliding on the full signature are near-dup
    * candidates. A 64-bit native variant lives in
    * graft.functions.SimHash64 for production use (tested in
    * ScalaTest; this query keeps the DuckDB-checkable form).
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(tokensCol)).as("tk"))
    val bits = tok
      .withColumn("b", explode(expr("sequence(0, 15)")))
      .withColumn("nib",
        expr("instr('0123456789abcdef', substring(md5(tk), (b div 4) + 1, 1)) - 1"))
      .withColumn("mask", expr(
        "CASE b % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END"))
      .withColumn("v", expr("CASE WHEN (nib div mask) % 2 = 1 THEN 1 ELSE -1 END"))
    val sim = bits.groupBy("doc_id", "b")
      .agg(sum("v").as("sv"))
      .withColumn("bit", when(col("sv") > 0, 1L).otherwise(0L))
      .groupBy("doc_id")
      .agg(sum(expr("bit * CAST(pow(2, b) AS BIGINT)")).as("simhash"))
    sim.as("a").join(sim.as("b"),
        col("a.simhash") === col("b.simhash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.simhash").as("simhash"))
      .orderBy("i", "j")
  }

  /** Character-3-gram jaccard within language blocks. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(spark, dir)
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"), array_distinct(expr(
        "transform(sequence(1, length(text)-2), i -> substring(text, i, 3))")).as("g"))
    g.as("a").join(g.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.g"), col("b.g"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("a.g")) + size(col("b.g")) - col("inter")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"), col("jaccard"))
      .orderBy("i", "j")
  }

  /** Embedding near-dup: top-1 cosine neighbor per vector inside its
    * label block (IVF-style coarse partition). Ranks on the rounded
    * cosine so cross-engine float drift can't flip the argmax.
    */
  def dedupEmbedNn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("norm", expr(
        "sqrt(aggregate(v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"))
    val pairs = e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"))
      .withColumn("cosine", round(col("dot") / (col("a.norm") * col("b.norm")), 6))
    val best = Window.partitionBy(col("a.vec_id"))
      .orderBy(col("cosine").desc, col("b.vec_id"))
    pairs.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"), col("cosine"))
      .orderBy("vec_id")
  }
}
