package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Live Common-Crawl ingestion seam — the one leg of the reference's
  * extraction layer that needs a network (extract_common_crawl.py
  * query_cdx / fetch_html_from_warc): CDX index query → JSON-line
  * captures → per-capture HTTP RANGE fetch of a gzip WARC member →
  * record text → [[Extraction.parseWarcRecords]].
  *
  * Both transports are INJECTED (the [[graft.operators
  * .BatchedPairClassifier]] discipline): `indexTransport` maps a CDX
  * query URL to the response body, `rangeTransport` maps
  * (file, firstByte, lastByte) to the raw range bytes. Everything
  * else — JSON-line parsing into the capture schema, byte-range
  * arithmetic (`offset`..`offset+length−1`, the reference's Range
  * header math), per-member gzip decode, bounded exponential-backoff
  * retry, and partition-parallel fan-out with no driver transfer —
  * is real and spec-tested against fake transports; a deployment
  * supplies only the HTTP send. This environment has no egress, so
  * no default transport ships on purpose.
  */
case class CdxCapture(urlkey: String, timestamp: String, url: String,
                      mime: String, status: Int, filename: String,
                      offset: Long, length: Long)

class CommonCrawlFetcher(indexTransport: String => String,
                         rangeTransport: (String, Long, Long) => Array[Byte],
                         maxRetries: Int = 3,
                         backoffMs: Long = 10L) extends Serializable {

  private def retry[A](f: => A): A = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(backoffMs << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** CDX query: one JSON object per line (the index API's
    * output=json shape); malformed lines are skipped like the
    * reference's per-line guard, not fatal. `offset` is the index
    * API's result-paging cursor (extract_common_crawl.py:21
    * query_cdx(limit, offset)).
    */
  def queryCdx(indexUrl: String, urlPattern: String,
               limit: Int = 100, offset: Long = 0L): Seq[CdxCapture] = {
    val body = retry(indexTransport(
      s"$indexUrl?url=$urlPattern&output=json&filter=mime:text/html" +
        s"&limit=$limit&offset=$offset"))
    body.linesIterator.filter(_.nonEmpty).flatMap(parseCdxLine).toSeq
  }

  /** Multi-page CDX iteration — the reference's crawl driver
    * (extract_common_crawl.py:122 extract_all_australian_companies):
    * `offset += batch_size` per page, stop at the first EMPTY page
    * (a short non-empty page does not stop the loop — the next query
    * discovers exhaustion, exactly like the reference), optionally
    * capped at `maxBatches` pages. Runs on the driver by design: CDX
    * pages are small index metadata; the heavy WARC range fetches
    * stay partition-parallel in [[fetchRecords]].
    */
  def queryCdxAll(indexUrl: String, urlPattern: String,
                  batchSize: Int = 10000,
                  maxBatches: Option[Int] = None): Seq[CdxCapture] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(maxBatches.forall(_ > 0), s"maxBatches must be positive: $maxBatches")
    val pages = Iterator.from(0)
      .map(b => queryCdx(indexUrl, urlPattern, limit = batchSize,
        offset = b.toLong * batchSize))
      .takeWhile(_.nonEmpty)
    maxBatches.fold(pages)(pages.take).flatten.toSeq
  }

  /** The end-to-end live-ingestion composition at the reference's
    * granularity: paginate the index, fan the captures out over
    * `parallelism` partitions, range-fetch + gunzip + WARC-parse in
    * the executors. One call replaces the reference's whole
    * while-loop body, with the per-record work distributed.
    */
  def fetchAllParsed(spark: org.apache.spark.sql.SparkSession,
                     indexUrl: String, urlPattern: String,
                     batchSize: Int = 10000,
                     maxBatches: Option[Int] = None,
                     parallelism: Int = 32): DataFrame = {
    import spark.implicits._
    val caps = queryCdxAll(indexUrl, urlPattern, batchSize, maxBatches)
    fetchAndParse(spark.createDataset(caps).repartition(parallelism))
  }

  private val field = """"(urlkey|timestamp|url|mime|status|filename|offset|length)":\s*"((?:[^"\\]|\\.)*)"""".r

  private[sources] def parseCdxLine(line: String): Option[CdxCapture] = {
    val kv = field.findAllMatchIn(line).map(m => m.group(1) -> m.group(2)).toMap
    try {
      for {
        uk <- kv.get("urlkey"); ts <- kv.get("timestamp"); u <- kv.get("url")
        f <- kv.get("filename"); off <- kv.get("offset"); len <- kv.get("length")
      } yield CdxCapture(uk, ts, u, kv.getOrElse("mime", ""),
        kv.get("status").map(_.toInt).getOrElse(0), f, off.toLong, len.toLong)
    } catch { case _: NumberFormatException => None }
  }

  /** Partition-parallel record fetch: each capture's byte range is
    * pulled through the injected transport, gunzipped (CC stores one
    * gzip member per record), and decoded — one transport session's
    * worth of requests per PARTITION, no driver transfer. Output is
    * `rec` rows ready for [[Extraction.parseWarcRecords]].
    */
  def fetchRecords(captures: Dataset[CdxCapture]): DataFrame = {
    import captures.sparkSession.implicits._
    val self = this
    captures.mapPartitions { it =>
      it.map { c =>
        val bytes = self.retry(
          rangeTransport(c.filename, c.offset, c.offset + c.length - 1))
        CommonCrawlFetcher.gunzip(bytes)
      }
    }.toDF("rec")
  }

  def fetchAndParse(captures: Dataset[CdxCapture]): DataFrame =
    Extraction.parseWarcRecords(fetchRecords(captures))
}

object CommonCrawlFetcher {
  /** One gzip member → UTF-8 text; plain bytes pass through (some
    * mirrors serve ranges pre-inflated).
    */
  def gunzip(bytes: Array[Byte]): String = {
    val isGzip = bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b
    if (!isGzip) return new String(bytes, "UTF-8")
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }
}
