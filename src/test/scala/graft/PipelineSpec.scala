package graft

class PipelineSpec extends SparkSpec {

  test("full clean->match->quality pipeline writes every stage") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipeline").toString
    val results = Pipeline.run(spark, sf, out)
    assert(results.map(_.name) ==
      Seq("abr_cleaned", "cc_cleaned", "entity_matches", "quality_metrics"))
    assert(results.forall(_.rows > 0), results.mkString(", "))
    // partitioned stages have key directories
    val matchDirs = new java.io.File(s"$out/entity_matches").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(matchDirs.exists(_.startsWith("method=")))
    // stage outputs re-read cleanly
    assert(spark.read.parquet(s"$out/quality_metrics").count() == 10)
  }

  test("curation pipeline: quality -> dup components -> curated sample") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft-curation").toString
    val results = Pipeline.runCuration(spark, sf, out)
    assert(results.map(_.name) ==
      Seq("doc_quality", "dup_components", "curation_decisions", "curated_sample"))
    assert(results.forall(_.rows > 0), results.mkString(", "))
    // the curated sample is a strict subset of the corpus...
    val nDocs = Tables.documents(spark, sf).count()
    val curated = spark.read.parquet(s"$out/curated_sample")
    assert(curated.count() < nDocs)
    // ...that chains on the earlier stages: no quality failures, no
    // dup-election losers survive
    val quality = spark.read.parquet(s"$out/doc_quality")
    assert(curated.join(quality.filter(col("quality_bucket") =!= "ok"), "doc_id").count() == 0)
    val losers = spark.read.parquet(s"$out/dup_components")
      .filter(col("id") =!= col("component")).select(col("id").as("doc_id"))
    assert(curated.join(losers, "doc_id").count() == 0)
  }
}
