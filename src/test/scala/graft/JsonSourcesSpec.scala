package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** JSONL ingestion: well-formed rows parse against the explicit
  * schema, malformed/incomplete lines are quarantined with their raw
  * bytes — nothing crashes, nothing is silently dropped.
  */
class JsonSourcesSpec extends SparkSpec {

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("good lines parse, bad lines quarantine with raw bytes kept") {
    val dir = writeLines(Seq(
      """{"doc_id": 1, "lang": "en", "source": "web", "text": "hello world"}""",
      """{"doc_id": 2, "lang": "de", "source": "web", "text": "guten tag"}""",
      """this is not json at all""",
      """{"doc_id": 3, "lang": "en", "source": "web", "text": "truncated""",
      """{"lang": "fr", "source": "web", "text": "no id on this one"}"""))
    val good = sources.JsonSources.goodDocs(spark, dir)
    assert(good.count() == 2)
    assert(good.columns.toSeq == Seq("doc_id", "lang", "source", "text"))
    assert(good.filter(col("doc_id").isin(1L, 2L)).count() == 2)

    val bad = sources.JsonSources.quarantine(spark, dir).collect()
    assert(bad.length == 3)
    val byReason = bad.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byReason("malformed_json") == 2)
    assert(byReason("missing_doc_id") == 1)
    // raw bytes preserved for replay
    assert(bad.exists(_.getString(0).contains("not json at all")))
    assert(bad.exists(_.getString(0).contains("no id on this one")))
  }

  test("good + quarantined = every input line; empty input is fine") {
    val lines = (1L to 20L).map { i =>
      if (i % 5 == 0) s"""broken line $i"""
      else s"""{"doc_id": $i, "lang": "en", "source": "s", "text": "doc $i"}"""
    }
    val dir = writeLines(lines)
    val nGood = sources.JsonSources.goodDocs(spark, dir).count()
    val nBad = sources.JsonSources.quarantine(spark, dir).count()
    assert(nGood + nBad == lines.length)
    assert(nGood == 16 && nBad == 4)

    val empty = writeLines(Seq())
    assert(sources.JsonSources.goodDocs(spark, empty).count() == 0)
  }
}
