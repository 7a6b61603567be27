package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import operators.{BatchedPairClassifier, HeuristicPairClassifier, PairClassifier,
  PairInput, PairVerdict}

class PairClassifierSpec extends SparkSpec {

  test("heuristic default agrees with match_llm_stub digit-for-digit") {
    import spark.implicits._
    val pairs = operators.Matching.matchFuzzyBlocked(spark, sf)
      .select(col("c_custkey").as("left_id"), col("s_suppkey").as("right_id"),
        col("c_name").as("left_name"), col("s_name").as("right_name"))
      .as[PairInput]
    val got = PairClassifier.classifyPairs(pairs, HeuristicPairClassifier)
      .collect().map(r => (r.left_id, r.right_id) ->
        (r.matched, r.confidence, r.reason)).toMap
    val want = operators.Matching.matchLlmStub(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getBoolean(2), r.getDouble(3), r.getString(4))).toMap
    assert(got.keySet == want.keySet)
    val diffs = want.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(diffs.isEmpty, s"seam diverges from the stub: ${diffs.take(3)}")
  }

  test("batched skeleton: chunking, order, and the JSON wire round-trip") {
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    val transport: String => String = { req =>
      val pairs = """"left":"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(req).toSeq
      batches += pairs.length
      // echo service: verdict encodes the left name so order is provable
      BatchedPairClassifier.toResponseJson(pairs.map(m =>
        PairVerdict(matched = true, 0.5, s"saw ${m.group(1)}")))
    }
    val clf = new BatchedPairClassifier(transport, batchSize = 4)
    val in = (1 to 10).map(i => (s"name$i", s"other$i"))
    val out = clf.classifyBatch(in)
    assert(batches.toSeq == Seq(4, 4, 2), s"chunking: $batches")
    assert(out.map(_.reason) == (1 to 10).map(i => s"saw name$i"),
      "verdicts must come back in input order")
  }

  test("batched skeleton: transient failures retry with backoff, then succeed") {
    val calls = new AtomicInteger(0)
    val transport: String => String = { req =>
      if (calls.incrementAndGet() <= 2) throw new RuntimeException("503")
      BatchedPairClassifier.toResponseJson(
        Seq(PairVerdict(matched = false, 0.1, "ok after retries")))
    }
    val clf = new BatchedPairClassifier(transport, batchSize = 8,
      maxRetries = 3, backoffMs = 1)
    val out = clf.classifyBatch(Seq(("a", "b")))
    assert(out.head.reason == "ok after retries" && calls.get() == 3)
  }

  test("batched skeleton: retry budget exhausts, contract violations throw") {
    val always: String => String = _ => throw new RuntimeException("down")
    val clf = new BatchedPairClassifier(always, maxRetries = 2, backoffMs = 1)
    intercept[RuntimeException] { clf.classifyBatch(Seq(("a", "b"))) }
    // wrong-arity response is a contract violation, not silently zipped
    val short: String => String = _ =>
      BatchedPairClassifier.toResponseJson(Seq(PairVerdict(true, 1.0, "only one")))
    val clf2 = new BatchedPairClassifier(short, batchSize = 2)
    intercept[IllegalArgumentException] {
      clf2.classifyBatch(Seq(("a", "b"), ("c", "d")))
    }
  }

  test("wire format: escaping survives quotes, backslashes, newlines") {
    val nasty = Seq(PairVerdict(true, 0.987654,
      "he said \"match\\maybe\"\nnext line"))
    val parsed = BatchedPairClassifier.parseResponseJson(
      BatchedPairClassifier.toResponseJson(nasty))
    assert(parsed == nasty)
  }

  test("classifyPairs runs the remote skeleton partition-parallel") {
    import spark.implicits._
    val transport: String => String = { req =>
      val n = """"left":""".r.findAllMatchIn(req).length
      BatchedPairClassifier.toResponseJson(
        (1 to n).map(_ => PairVerdict(matched = true, 1.0, "remote")))
    }
    val ds = spark.createDataset((1L to 40L).map(i =>
      PairInput(i, i + 1000, s"acme $i", s"acme $i"))).repartition(5)
    val out = PairClassifier.classifyPairs(ds,
      new BatchedPairClassifier(transport, batchSize = 3)).collect()
    assert(out.length == 40 && out.forall(_.reason == "remote"))
    assert(out.map(_.left_id).toSet == (1L to 40L).toSet)
  }
}
