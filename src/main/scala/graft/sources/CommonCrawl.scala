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
    * reference's per-line guard, not fatal.
    */
  def queryCdx(indexUrl: String, urlPattern: String,
               limit: Int = 100): Seq[CdxCapture] = {
    val body = retry(indexTransport(
      s"$indexUrl?url=$urlPattern&output=json&filter=mime:text/html&limit=$limit"))
    body.linesIterator.filter(_.nonEmpty).flatMap(parseCdxLine).toSeq
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
