package graft.sources

import java.io.BufferedInputStream
import java.util.zip.ZipInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ABR bulk-dump acquisition seam — the reference's `download_zip` /
  * `unzip_files` pair (extract_abr_xml.py:17-38: HTTP fetch of the
  * ABR bulk ZIP, then member extraction ahead of iterparse),
  * re-expressed for a cluster and composing into the SPLITTABLE
  * [[Extraction.readXmlFiles]] path.
  *
  * The HTTP transport is INJECTED (`url → InputStream`, the
  * [[CommonCrawlFetcher]] discipline — this environment has no
  * egress, so no default transport ships on purpose); everything
  * else is real: single-pass STREAMING unzip (the archive is never
  * buffered — a multi-GB dump flows `transport → ZipInputStream →
  * member file` in 64 KB chunks), Hadoop-FS member writes with a
  * tmp-file + rename publish (readers of `destDir` never observe a
  * half-written member), bounded exponential-backoff retry, and —
  * for the multi-archive form the ABR actually publishes (two ZIPs
  * of ~20 XML parts each) — partition-parallel fan-out where each
  * task streams its own archive straight to the shared filesystem
  * and only the extracted PATHS return to the driver.
  *
  * At 100 TB-pipeline scale the interesting part is what happens
  * after: the staged members are plain files on the cluster FS, so
  * [[Extraction.extractXmlFromFiles]] fans each one out across
  * `maxPartitionBytes` splits (lineSep record framing) — acquisition
  * parallelism is per-archive, parse parallelism is per-split, and
  * neither holds a whole file in memory.
  */
/** @param transport url → stream. MUST be Serializable (a lambda
  *   capturing only serializable state qualifies): [[fetchDumps]]
  *   ships the whole fetcher — transport included — inside task
  *   closures, and a non-serializable capture fails only at runtime
  *   with an opaque Task-not-serializable error.
  */
class AbrDumpFetcher(transport: String => java.io.InputStream,
                     maxRetries: Int = 3,
                     backoffMs: Long = 10L) extends Serializable {

  private def retry[A](what: String)(f: => A): A = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt > maxRetries) throw e
          // runs INSIDE tasks in the parallel form — log each attempt
          // so a long backoff on a blocked executor slot is visible,
          // and keep the sleep bounded by the retry budget
          System.err.println(
            s"[abr-fetch] $what attempt $attempt/$maxRetries failed (${e.getMessage}); " +
              s"backing off ${backoffMs << (attempt - 1)} ms")
          Thread.sleep(backoffMs << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Stream one archive's `.xml` members into `destDir`. Member
    * names are flattened to their basename (zip-slip guard — an
    * entry named `../x.xml` cannot escape the dest dir) and
    * non-XML members are skipped, mirroring the reference globbing
    * `*.xml` after its blanket extract. A retry restarts the whole
    * archive: members publish by tmp-file rename, so a half-written
    * member from the failed attempt is invisible and simply
    * re-extracted.
    *
    * Collision safety: two entries flattening to the same basename
    * (subdirs like `a/part1.xml` + `b/part1.xml`) would silently
    * overwrite — the second occurrence publishes under its SANITIZED
    * full entry path instead, so no record is lost. The tmp staging
    * name is per-call unique (UUID), so parallel extractions of
    * different archives into one destDir never race on a shared
    * staging path; cross-ARCHIVE basename collisions are
    * disambiguated by [[fetchDumps]]' per-archive prefix.
    */
  private[sources] def extractOne(conf: Configuration, zipUrl: String,
                                  destDir: String,
                                  namePrefix: String = ""): Seq[String] =
    retry(zipUrl) {
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(conf)
    fs.mkdirs(dest)
    val zin = new ZipInputStream(new BufferedInputStream(transport(zipUrl)))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val seen = scala.collection.mutable.Set.empty[String]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val base = new java.io.File(e.getName).getName
        if (!e.isDirectory && base.toLowerCase.endsWith(".xml")) {
          // first occurrence keeps the reference's flat basename;
          // a within-archive collision falls back to the sanitized
          // entry path (slashes → _, traversal segments neutralized)
          val name = namePrefix + (
            if (seen.add(base)) base
            else e.getName.replaceAll("[^A-Za-z0-9._-]+", "_")
              .replaceAll("\\.\\.", "_"))
          val tmp = new Path(dest,
            s"_tmp_${java.util.UUID.randomUUID().toString.take(8)}_$name")
          val fin = new Path(dest, name)
          val os = fs.create(tmp, true)
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = zin.read(buf)
            while (n >= 0) {
              if (n > 0) os.write(buf, 0, n)
              n = zin.read(buf)
            }
          } finally os.close()
          fs.delete(fin, false)
          if (!fs.rename(tmp, fin))
            sys.error(s"could not publish $fin")
          out += fin.toString
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toSeq
  }

  /** `download_zip` + `unzip_files` for one archive, driver-side. */
  def fetchDump(spark: SparkSession, zipUrl: String,
                destDir: String): Seq[String] =
    extractOne(spark.sparkContext.hadoopConfiguration, zipUrl, destDir)

  /** Multi-archive form: one task per archive, each streaming its
    * ZIP through the injected transport directly to the shared
    * filesystem — no bytes cross the driver, only extracted paths.
    * The Hadoop conf travels as plain entries (a `Configuration`
    * itself is not serializable), so cluster-FS credentials set on
    * the session reach the tasks.
    */
  def fetchDumps(spark: SparkSession, zipUrls: Seq[String],
                 destDir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val entries = spark.sparkContext.hadoopConfiguration.asScala
      .map(e => (e.getKey, e.getValue)).toSeq
    val self = this
    // archives sharing a member basename (the ABR publishes
    // part-numbered members per ZIP, but nothing guarantees it) must
    // not overwrite each other in the shared destDir: each archive's
    // members publish under a stable per-archive prefix derived from
    // its position in the request
    val indexed = zipUrls.zipWithIndex
    spark.sparkContext
      .parallelize(indexed, math.max(1, indexed.size))
      .mapPartitions { urls =>
        val conf = new Configuration(false)
        entries.foreach { case (k, v) => conf.set(k, v) }
        urls.flatMap { case (u, i) =>
          self.extractOne(conf, u, destDir, namePrefix = f"a$i%03d_") }
      }
      .collect().toSeq
  }

  /** The full reference leg: acquire the dump, then parse the staged
    * members through the splittable reader into the entity schema
    * (extract_abr_xml.py's download → unzip → iterparse chain as
    * fetch → stage → [[Extraction.parseXmlEntities]]).
    */
  def extractEntities(spark: SparkSession, zipUrl: String,
                      destDir: String): DataFrame = {
    fetchDump(spark, zipUrl, destDir)
    Extraction.extractXmlFromFiles(spark, destDir)
  }
}
