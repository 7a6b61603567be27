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
      Seq("doc_quality", "dup_components", "curation_decisions", "curated_sample",
        "training_export"))
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
    // the export ships exactly the curated docs, laid out by split
    // (partition pruning serves a trainer's split without a scan),
    // with the PII detectors reporting clean redacted text
    val export = spark.read.parquet(s"$out/training_export")
    assert(export.count() == curated.count())
    assert(export.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))
    val splitDirs = new java.io.File(s"$out/training_export").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(splitDirs.forall(_.startsWith("split=")), splitDirs.toString)
    assert(export.filter(
      col("text").rlike(operators.TextAnalysis.piiEmailRe)).count() == 0)
  }
}
