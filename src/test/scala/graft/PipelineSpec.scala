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

  test("curation pipeline: quality -> dup components -> sample") {
    val out = java.nio.file.Files.createTempDirectory("graft-curation").toString
    val results = Pipeline.runCuration(spark, sf, out)
    assert(results.map(_.name) == Seq("doc_quality", "dup_components", "sampled"))
    assert(results.forall(_.rows > 0), results.mkString(", "))
    // the sample is a strict, non-empty subset of the corpus
    val nDocs = Tables.documents(spark, sf).count()
    val sampled = results.find(_.name == "sampled").get.rows
    assert(sampled < nDocs)
  }
}
