package graft

import java.io.ByteArrayOutputStream
import java.util.concurrent.atomic.AtomicInteger
import java.util.zip.GZIPOutputStream

import sources.{CdxCapture, CommonCrawlFetcher}

/** Transport fakes live outside the spec class: mapPartitions
  * closures must not capture the (non-serializable) suite instance.
  */
object CommonCrawlSpecFakes extends Serializable {
  def gzip(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new GZIPOutputStream(bos)
    out.write(s.getBytes("UTF-8")); out.close()
    bos.toByteArray
  }

  def warcRec(i: Int): String =
    s"WARC/1.0\nWARC-Type: response\n" +
      s"WARC-Target-URI: https://www.site$i.example.com/\n" +
      s"WARC-Record-ID: rec-$i\nContent-Length: 52\n\n" +
      s"<html><head><title>Site$i | Site</title></head><body>x</body></html>\n"

  val ranges: scala.collection.mutable.Set[(String, Long, Long)] =
    scala.collection.mutable.Set.empty
  val calls = new AtomicInteger(0)
}

class CommonCrawlSpec extends SparkSpec {
  import CommonCrawlSpecFakes.{gzip, warcRec}

  test("CDX JSON-line parse: capture schema, malformed lines skipped") {
    val fetcher = new CommonCrawlFetcher(
      _ => // two good lines, one junk, one missing offset
        """{"urlkey":"com,example)/","timestamp":"20250101000000","url":"https://example.com/","mime":"text/html","status":"200","filename":"seg/a.warc.gz","offset":"100","length":"250"}""" +
          "\nnot json at all\n" +
          """{"urlkey":"com,other)/","timestamp":"20250102000000","url":"https://other.com/","mime":"text/html","status":"200","filename":"seg/b.warc.gz","offset":"400","length":"99"}""" +
          "\n" +
          """{"urlkey":"com,broken)/","timestamp":"x","url":"u","filename":"f"}""",
      (_, _, _) => Array.emptyByteArray)
    val caps = fetcher.queryCdx("https://index.example/CC-index", "*.example.com")
    assert(caps.map(_.urlkey) == Seq("com,example)/", "com,other)/"))
    assert(caps.head == CdxCapture("com,example)/", "20250101000000",
      "https://example.com/", "text/html", 200, "seg/a.warc.gz", 100L, 250L))
  }

  test("range fetch: byte-range math, gzip member decode, partition parallel") {
    import spark.implicits._
    val ranges = CommonCrawlSpecFakes.ranges
    ranges.clear()
    val fetcher = new CommonCrawlFetcher(
      _ => "",
      (file, first, last) => {
        CommonCrawlSpecFakes.ranges.synchronized {
          CommonCrawlSpecFakes.ranges += ((file, first, last))
        }
        CommonCrawlSpecFakes.gzip(CommonCrawlSpecFakes.warcRec(
          file.stripPrefix("seg/").stripSuffix(".warc.gz").toInt))
      })
    val caps = spark.createDataset((1 to 20).map(i =>
      CdxCapture(s"k$i", "t", "u", "text/html", 200, s"seg/$i.warc.gz",
        i * 1000L, 500L))).repartition(4)
    val parsed = fetcher.fetchAndParse(caps).collect()
    assert(parsed.length == 20)
    assert(parsed.map(_.getAs[String]("record_id")).toSet ==
      (1 to 20).map(i => s"rec-$i").toSet)
    assert(parsed.map(_.getAs[String]("page_title")).toSet ==
      (1 to 20).map(i => s"Site$i").toSet)
    // the Range header math of the reference: offset .. offset+length-1
    assert(ranges.toSet == (1 to 20).map(i =>
      (s"seg/$i.warc.gz", i * 1000L, i * 1000L + 499L)).toSet)
  }

  test("CDX pagination: offset advances by batchSize, stops on empty page, maxBatches caps") {
    // 5 captures served 2 per page: offsets 0,2,4 -> pages of 2,2,1,
    // then offset 6 -> empty -> stop (4 index requests total)
    def pagedTransport(log: scala.collection.mutable.Buffer[Long]): String => String = { url =>
      val off = "offset=(\\d+)".r.findFirstMatchIn(url).get.group(1).toLong
      val lim = "limit=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      log += off
      (off until math.min(off + lim, 5L)).map { i =>
        s"""{"urlkey":"k$i","timestamp":"t","url":"https://s$i.example/","mime":"text/html","status":"200","filename":"seg/$i.warc.gz","offset":"${i * 100}","length":"50"}"""
      }.mkString("\n")
    }
    val offsets = scala.collection.mutable.Buffer.empty[Long]
    val fetcher = new CommonCrawlFetcher(pagedTransport(offsets),
      (_, _, _) => Array.emptyByteArray)
    val all = fetcher.queryCdxAll("https://index.example/CC-index",
      "*.example", batchSize = 2)
    assert(all.map(_.urlkey) == (0 until 5).map(i => s"k$i"))
    assert(offsets.toSeq == Seq(0L, 2L, 4L, 6L))

    // maxBatches stops the loop after N pages and N index requests
    val offsets2 = scala.collection.mutable.Buffer.empty[Long]
    val capped = new CommonCrawlFetcher(pagedTransport(offsets2),
      (_, _, _) => Array.emptyByteArray)
    val two = capped.queryCdxAll("https://index.example/CC-index",
      "*.example", batchSize = 2, maxBatches = Some(2))
    assert(two.map(_.urlkey) == (0 until 4).map(i => s"k$i"))
    assert(offsets2.toSeq == Seq(0L, 2L))
  }

  test("fetchAllParsed: paginated captures flow partition-parallel into the WARC parse") {
    val fetcher = new CommonCrawlFetcher(
      { url =>
        val off = "offset=(\\d+)".r.findFirstMatchIn(url).get.group(1).toLong
        (off until math.min(off + 3, 7L)).map { i =>
          s"""{"urlkey":"k$i","timestamp":"t","url":"https://s$i.example/","mime":"text/html","status":"200","filename":"seg/$i.warc.gz","offset":"${i * 100}","length":"50"}"""
        }.mkString("\n")
      },
      (file, _, _) => CommonCrawlSpecFakes.gzip(CommonCrawlSpecFakes.warcRec(
        file.stripPrefix("seg/").stripSuffix(".warc.gz").toInt)))
    val parsed = fetcher.fetchAllParsed(spark, "https://index.example/CC-index",
      "*.example", batchSize = 3, parallelism = 4).collect()
    assert(parsed.length == 7)
    assert(parsed.map(_.getAs[String]("record_id")).toSet ==
      (0 until 7).map(i => s"rec-$i").toSet)
  }

  test("plain (pre-inflated) range bytes pass through without gunzip") {
    assert(CommonCrawlFetcher.gunzip("already text".getBytes("UTF-8"))
      == "already text")
    assert(CommonCrawlFetcher.gunzip(gzip("round trip")) == "round trip")
  }

  test("transient range failures retry with backoff; budget exhaustion throws") {
    import spark.implicits._
    val calls = CommonCrawlSpecFakes.calls
    calls.set(0)
    val flaky = new CommonCrawlFetcher(
      _ => "",
      (_, _, _) =>
        if (CommonCrawlSpecFakes.calls.incrementAndGet() <= 2)
          throw new RuntimeException("503")
        else CommonCrawlSpecFakes.gzip(CommonCrawlSpecFakes.warcRec(1)),
      maxRetries = 3, backoffMs = 1)
    val one = spark.createDataset(Seq(
      CdxCapture("k", "t", "u", "text/html", 200, "seg/1.warc.gz", 0L, 10L)))
    assert(flaky.fetchAndParse(one).count() == 1 && calls.get() == 3)
    val down = new CommonCrawlFetcher(_ => "",
      (_, _, _) => throw new RuntimeException("down"),
      maxRetries = 1, backoffMs = 1)
    intercept[org.apache.spark.SparkException] {
      down.fetchRecords(one).count()
    }
  }
}
