package graft

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{ConcurrentHashMap, Executors}
import java.util.zip.GZIPOutputStream

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import operators.{BatchedPairClassifier, HeuristicPairClassifier, PairClassifier, PairInput}
import sources.{CommonCrawlFetcher, HttpTransports}

/** Loopback-HTTP integration of the three remote seams — the real
  * wire, not an injected Scala function: a local
  * `com.sun.net.httpserver` serves CDX JSON-line pages (with the
  * limit/offset paging contract), 206 byte-ranges over a genuine
  * multi-member gzip WARC blob, and the LLM classify JSON shape —
  * each behind a fail-first-attempt wrapper so retry/backoff is
  * exercised end-to-end over sockets. [[sources.HttpTransports]] is
  * the production-shaped client side; the fetcher/classifier stacks
  * above it are the same code every fake-transport spec pins.
  *
  * Server state lives in the companion so Spark-side closures never
  * capture the suite instance.
  */
object LoopbackHttpSpecState {
  final val N = 25

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

  // one blob, N gzip members back-to-back — the CC segment layout;
  // members(i) = (offset, length) of record i inside the blob
  val (blob: Array[Byte], members: IndexedSeq[(Long, Long)]) = {
    val bos = new ByteArrayOutputStream()
    val offs = (1 to N).map { i =>
      val off = bos.size().toLong
      val m = gzip(warcRec(i))
      bos.write(m)
      (off, m.length.toLong)
    }
    (bos.toByteArray, offs)
  }

  def cdxLine(i: Int): String = {
    val (off, len) = members(i - 1)
    s"""{"urlkey":"com,site$i)/","timestamp":"20250101000000","url":"https://www.site$i.example.com/","mime":"text/html","status":"200","filename":"seg/00001.warc.gz","offset":"$off","length":"$len"}"""
  }

  val cdxRequests = new AtomicInteger(0)
  val rangeAttempts = new ConcurrentHashMap[String, Integer]()
  val classifyAttempts = new ConcurrentHashMap[String, Integer]()

  def bump(m: ConcurrentHashMap[String, Integer], k: String): Int =
    m.merge(k, 1, (a, b) => a + b)
}

class LoopbackHttpSpec extends SparkSpec {
  import LoopbackHttpSpecState._

  private var server: HttpServer = _
  private var base: String = _

  private def respond(ex: HttpExchange, status: Int, body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(Executors.newFixedThreadPool(8))

    // CDX index: the limit/offset paging contract over N captures
    server.createContext("/cdx", (ex: HttpExchange) => {
      cdxRequests.incrementAndGet()
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val kv = q.split("&").map(_.split("=", 2)).collect {
        case Array(k, v) => k -> v }.toMap
      val limit = kv.get("limit").map(_.toInt).getOrElse(100)
      val off = kv.get("offset").map(_.toLong).getOrElse(0L).toInt
      val page = (1 to N).slice(off, off + limit).map(cdxLine).mkString("\n")
      respond(ex, 200, page.getBytes("UTF-8"))
    })

    // WARC data bucket: Range → 206 slice of the member blob, first
    // attempt per distinct range 500s to force the retry path
    server.createContext("/data/", (ex: HttpExchange) => {
      val range = Option(ex.getRequestHeaders.getFirst("Range")).getOrElse("")
      val key = ex.getRequestURI.getPath + " " + range
      if (bump(rangeAttempts, key) == 1) respond(ex, 500, Array.emptyByteArray)
      else "bytes=(\\d+)-(\\d+)".r.findFirstMatchIn(range) match {
        case Some(m) =>
          val (a, b) = (m.group(1).toInt, m.group(2).toInt)
          respond(ex, 206, java.util.Arrays.copyOfRange(blob, a, b + 1))
        case None => respond(ex, 416, Array.emptyByteArray)
      }
    })

    // range-oblivious mirror: ignores the Range header and answers a
    // plain 200 with (possibly truncated) whole-object bytes — the
    // misconfigured-proxy shapes the transport must catch at the wire
    server.createContext("/oblivious/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val upto = if (path.endsWith("short.bin")) blob.length / 2 else blob.length
      respond(ex, 200, java.util.Arrays.copyOfRange(blob, 0, upto))
    })

    // LLM classify: parse the request pairs, answer the heuristic
    // verdicts in the wire shape; first attempt per body 503s
    server.createContext("/classify", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      if (bump(classifyAttempts, body) == 1) respond(ex, 503, Array.emptyByteArray)
      else {
        val pairRe = """\{"left":"((?:[^"\\]|\\.)*)","right":"((?:[^"\\]|\\.)*)"\}""".r
        val pairs = pairRe.findAllMatchIn(body)
          .map(m => (m.group(1), m.group(2))).toSeq
        val resp = BatchedPairClassifier.toResponseJson(
          HeuristicPairClassifier.classifyBatch(pairs))
        respond(ex, 200, resp.getBytes("UTF-8"))
      }
    })

    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    try server.stop(0) finally super.afterAll()
  }

  test("CC live-ingestion stack over the wire: paginate, range-fetch, retry, parse") {
    cdxRequests.set(0)
    rangeAttempts.clear()
    val fetcher = new CommonCrawlFetcher(
      indexTransport = HttpTransports.get,
      rangeTransport = HttpTransports.getRange(s"$base/data"),
      maxRetries = 3, backoffMs = 1L)
    val parsed = fetcher.fetchAllParsed(spark, s"$base/cdx",
      "*.example.com", batchSize = 10, parallelism = 4).collect()
    // pages of 10/10/5, then the empty page that stops the loop
    assert(cdxRequests.get() == 4, s"expected 4 CDX pages, saw ${cdxRequests.get()}")
    assert(parsed.length == N)
    assert(parsed.map(_.getAs[String]("record_id")).toSet ==
      (1 to N).map(i => s"rec-$i").toSet)
    assert(parsed.map(_.getAs[String]("page_title")).toSet ==
      (1 to N).map(i => s"Site$i").toSet)
    // every range failed once then succeeded. parseWarcRecords'
    // orderBy adds a range-partitioning SAMPLING pass over the same
    // mapPartitions, so each key is fetched once per Spark pass plus
    // the one injected failure: attempts are uniform and >= 2, and
    // the attempted ranges are the CDX members' exact byte spans
    import scala.jdk.CollectionConverters._
    val att = rangeAttempts.asScala
    assert(att.size == N)
    assert(att.values.forall(_ >= 2) && att.values.toSet.size == 1,
      s"attempt counts: ${att.values.toSeq.sorted}")
    val wantRanges = members.map { case (off, len) =>
      s"/data/seg/00001.warc.gz bytes=$off-${off + len - 1}" }.toSet
    assert(att.keySet == wantRanges)
  }

  test("range transport vs a range-oblivious 200 mirror: whole-object ok, truncation throws at the wire") {
    val fetch = HttpTransports.getRange(s"$base/oblivious") _
    // whole-object request from byte 0: a 200 with exactly the asked
    // span is accepted (range-oblivious but complete mirror)
    val whole = fetch("full.bin", 0L, blob.length - 1L)
    assert(whole.toSeq == blob.toSeq)
    // same but the mirror ALSO truncates: must fail here, naming the
    // URL — not 3 layers later as an anonymous gzip parse error
    val e = intercept[java.io.IOException] {
      fetch("short.bin", 0L, blob.length - 1L)
    }
    assert(e.getMessage.contains("truncated 200"))
    assert(e.getMessage.contains("short.bin"))
    // a mid-object range against a 200-only mirror is NEVER sliced
    // client-side silently: non-zero first + 200 is an error
    val e2 = intercept[java.io.IOException] {
      fetch("full.bin", 10L, 20L)
    }
    assert(e2.getMessage.contains("expected 206"))
  }

  test("batched LLM classifier over the wire: chunking, 503 retry, verdict parity") {
    classifyAttempts.clear()
    import spark.implicits._
    val names = (1 to 10).map(i =>
      PairInput(i.toLong, i + 100L, s"Customer#${1000 + i}",
        if (i % 2 == 0) s"Customer#${1000 + i}" else s"Supplier#${2000 + i}"))
    val clf = new BatchedPairClassifier(
      HttpTransports.post(s"$base/classify"),
      batchSize = 4, maxRetries = 2, backoffMs = 1L)
    val got = PairClassifier.classifyPairs(
      spark.createDataset(names).repartition(2), clf)
      .collect().map(r => (r.left_id, r.right_id) -> (r.matched, r.confidence)).toMap
    val want = names.map(p => (p.left_id, p.right_id) -> {
      val v = HeuristicPairClassifier.classifyBatch(
        Seq((p.left_name, p.right_name))).head
      (v.matched, v.confidence)
    }).toMap
    assert(got == want)
    // each distinct request body was answered after exactly one 503
    import scala.jdk.CollectionConverters._
    val att = classifyAttempts.asScala
    assert(att.nonEmpty && att.values.forall(_ == 2),
      s"attempt counts: ${att.values.toSeq.sorted}")
  }
}
