package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Lifecycle pins for the persisted ANN index: build once, write,
  * probe the stored copy — the probe must match the in-memory result
  * exactly AND touch only the probed cells (dynamic partition pruning
  * on the list layout). Recall of the candidate generation itself is
  * pinned separately by knn_recall_eval.
  */
class IndexSpec extends SparkSpec {

  test("IVF index round-trip: build -> write -> probe matches in-memory knn_ivf") {
    val idx = Files.createTempDirectory("graft-ivf").toString
    operators.Similarity.buildIvfIndex(spark, sf, idx)
    val mem = operators.Similarity.knnIvf(spark, sf)
    val disk = operators.Similarity.knnIvfPersisted(spark, sf, idx)
    assert(disk.schema == mem.schema,
      s"stored-index probe must keep the schema:\n${disk.schema}\nvs\n${mem.schema}")
    assert(disk.collect().toSeq == mem.collect().toSeq,
      "stored-index probe must return the in-memory result")
  }

  test("IVF probe prunes the list partitions it does not probe") {
    val idx = Files.createTempDirectory("graft-ivf-dpp").toString
    operators.Similarity.buildIvfIndex(spark, sf, idx)
    val probe = operators.Similarity.knnIvfPersisted(spark, sf, idx)
    val p = probe.queryExecution.executedPlan.toString
    // the 2-cell broadcast must reach the lists scan as a dynamic
    // partition filter — without it the "index" degenerates to a full
    // corpus scan and the stored layout buys nothing at scale
    assert(p.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the lists scan:\n${p.take(3000)}")
  }

  test("knnIvfIndexed builds on first use and reuses the stored index after") {
    val out1 = operators.Similarity.knnIvfIndexed(spark, sf).collect().toSeq
    // second call must hit the already-written index (same result)
    val out2 = operators.Similarity.knnIvfIndexed(spark, sf).collect().toSeq
    val mem = operators.Similarity.knnIvf(spark, sf).collect().toSeq
    assert(out1 == mem && out2 == mem)
  }
}
