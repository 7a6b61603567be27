package graft

class ExtractionOpsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("clean_html_boilerplate: no tags survive, boilerplate text is gone") {
    val out = sources.Extraction.cleanHtmlBoilerplate(spark, sf).cache()
    assert(out.filter(col("clean_text").rlike("<[^>]*>")).count() == 0,
      "no markup may survive the strip")
    assert(out.filter(col("clean_text").contains("Copyright") ||
      col("clean_text").contains("Home About Contact") ||
      col("clean_text").contains("track(")).count() == 0,
      "nav/footer/script content must be removed")
    assert(out.filter(col("content_ratio") <= 0 || col("content_ratio") >= 1).count() == 0)
    // the real paragraph content is retained
    assert(out.filter(length(col("clean_text")) === 0).count() == 0)
    out.unpersist()
  }

  test("extract_cdx_filter: only fetchable captures, exactly the latest per urlkey") {
    val out = sources.Extraction.extractCdxFilter(spark, sf).cache()
    val parts = Tables.part(spark, sf)
    // expected survivors: status 200 (key%5 not in {3,4}) and html (key%7 != 0)
    val expect = parts.filter(col("p_partkey") % 5 =!= 3 &&
      col("p_partkey") % 5 =!= 4 && col("p_partkey") % 7 =!= 0).count()
    assert(out.count() == expect, s"${out.count()} vs $expect")
    // one row per urlkey, and it is the LATER capture (+5000 suffix digest)
    assert(out.select("urlkey").distinct().count() == out.count())
    assert(out.filter(!col("timestamp").endsWith("5000")).count() > 0 ||
      out.filter(col("timestamp").substr(lit(5), lit(10)).cast("long") % 10000000 >= 5000)
        .count() == out.count())
    out.unpersist()
  }

  test("knn_recall_vs_nprobe: candidates and recall are monotone in nprobe") {
    val rows = operators.Similarity.knnRecallVsNprobe(spark, sf).collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.length == 3)
    val cands = rows.map(_.getAs[Long]("n_candidates"))
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(cands.zip(cands.tail).forall { case (a, b) => a < b },
      "probing more cells strictly widens the candidate set")
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
  }
}

import java.nio.file.{Files, Path}

import graft.sources.Extraction

/** File-in ingestion: the same columnar parsers used by the
  * registered extraction queries, fed from actual files on disk
  * (spark.read wholetext) — the composition the reference's
  * per-file iterparse/warcio loops perform.
  */
class ExtractionFilesSpec extends SparkSpec {

  private def write(dir: Path, name: String, content: String): Unit =
    Files.write(dir.resolve(name), content.getBytes("UTF-8"))

  test("ABR XML files round-trip through parseXmlEntities") {
    val dir = Files.createTempDirectory("graft-xml")
    write(dir, "a.xml",
      """<ABR><ABN status="ACT" ABNStatusFromDate="20200115">00000000001</ABN>""" +
        "<EntityType><EntityTypeText>PRV</EntityTypeText></EntityType>" +
        "<MainEntity><NonIndividualName><NonIndividualNameText>Acme Pty" +
        "</NonIndividualNameText></NonIndividualName></MainEntity>" +
        "<BusinessAddress><AddressDetails><State>NSW</State><Postcode>2000" +
        "</Postcode></AddressDetails></BusinessAddress></ABR>")
    // person-name + MainBusinessPhysicalAddress fallback paths
    write(dir, "b.xml",
      """<ABR><ABN status="CAN" ABNStatusFromDate="20210301">00000000002</ABN>""" +
        "<EntityType><EntityTypeText>IND</EntityTypeText></EntityType>" +
        "<LegalEntity><IndividualName><GivenName>Jane</GivenName>" +
        "<FamilyName>Doe</FamilyName></IndividualName></LegalEntity>" +
        "<MainBusinessPhysicalAddress><AddressDetails><State>VIC</State>" +
        "<Postcode>3000</Postcode></AddressDetails></MainBusinessPhysicalAddress></ABR>")
    val out = Extraction.extractXmlFromFiles(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5), r.getString(6)))
    assert(out.toSeq == Seq(
      ("00000000001", "Acme Pty", "ACT", "20200115", "PRV", "NSW", "2000"),
      ("00000000002", "Jane Doe", "CAN", "20210301", "IND", "VIC", "3000")))
  }

  test("WARC files split into records and parse through parseWarcRecords") {
    val dir = Files.createTempDirectory("graft-warc")
    val rec1 = "WARC/1.0\nWARC-Type: response\n" +
      "WARC-Target-URI: https://www.acme.example.com/\n" +
      "WARC-Record-ID: rec-1\nContent-Length: 52\n\n" +
      "<html><head><title>Acme | Site</title></head><body>x</body></html>\n"
    val rec2 = "WARC/1.0\nWARC-Type: response\n" +
      "WARC-Target-URI: https://www.zorg.example.com/\n" +
      "WARC-Record-ID: rec-2\nContent-Length: 48\n\n" +
      "<html><head><title>Zorg | Site</title></head><body>y</body></html>\n"
    write(dir, "seg.warc", rec1 + rec2)
    val out = Extraction.extractWarcFromFiles(spark, dir.toString)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(4)))
    assert(out.toSeq == Seq(
      ("https://www.acme.example.com/", "rec-1", "Acme"),
      ("https://www.zorg.example.com/", "rec-2", "Zorg")))
  }

  test("XML framing: prefix-sharing sibling tags and truncated tails are handled") {
    val dir = Files.createTempDirectory("graft-xml-frame")
    // leading junk includes <ABRN> — a tag SHARING the record tag's
    // prefix: the open-tag match must skip it (a bare locate('<ABR')
    // anchors the strip there, leaving '<ABRN>noise</ABRN>' glued to
    // the record head)
    write(dir, "a.xml",
      "<ABRN>noise</ABRN>" +
        """<ABR><ABN status="ACT" ABNStatusFromDate="20200115">00000000001</ABN>""" +
        "<EntityType><EntityTypeText>PRV</EntityTypeText></EntityType>" +
        "<MainEntity><NonIndividualName><NonIndividualNameText>Acme Pty" +
        "</NonIndividualNameText></NonIndividualName></MainEntity>" +
        "<BusinessAddress><AddressDetails><State>NSW</State><Postcode>2000" +
        "</Postcode></AddressDetails></BusinessAddress></ABR>\n" +
        // a record the dump was truncated in the middle of: no closing
        // delimiter, tail cut mid-text — must be dropped, not sealed
        // into a malformed accepted row
        """<ABR><ABN status="ACT" ABNStatusFromDate="20210101">000000""")
    val xml = Extraction.readXmlFiles(spark, dir.toString).collect().map(_.getString(0))
    assert(xml.length == 1, s"exactly the complete record survives, got ${xml.toSeq}")
    assert(xml.head.startsWith("<ABR>"),
      "the strip must anchor at the real open tag, not the <ABRN> prefix sibling")
    val out = Extraction.parseXmlEntities(
      Extraction.readXmlFiles(spark, dir.toString))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("00000000001", "Acme Pty")))
  }

  test("ONE multi-record XML file parallelizes across splits with identical rows") {
    // the 100TB shape: a single multi-GB dump file must fan out
    // across tasks (lineSep record framing), not become one wholetext
    // String — records spanning a split boundary must stitch cleanly
    val dir = Files.createTempDirectory("graft-xml-big")
    def rec(i: Int): String =
      s"""<ABR><ABN status="ACT" ABNStatusFromDate="20200115">${"%011d".format(i.toLong)}</ABN>""" +
        s"<EntityType><EntityTypeText>PRV</EntityTypeText></EntityType>" +
        s"<MainEntity><NonIndividualName><NonIndividualNameText>Org $i" +
        "</NonIndividualNameText></NonIndividualName></MainEntity>" +
        s"<BusinessAddress><AddressDetails><State>NSW</State><Postcode>2000" +
        "</Postcode></AddressDetails></BusinessAddress></ABR>"
    val n = 2000
    write(dir, "dump.xml", (1 to n).map(rec).mkString("\n"))
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val df = Extraction.readXmlFiles(spark, dir.toString)
      assert(df.rdd.getNumPartitions > 1,
        s"one file must split into many tasks, got ${df.rdd.getNumPartitions}")
      val parsed = Extraction.parseXmlEntities(df)
      assert(parsed.count() == n, "every record survives split stitching")
      val abns = parsed.select("abn").collect().map(_.getString(0)).sorted
      assert(abns.toSeq == (1 to n).map(i => "%011d".format(i.toLong)).sorted,
        "split-boundary records must parse identically")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
    }
  }

  test("ONE multi-record WARC file parallelizes across splits with identical rows") {
    val dir = Files.createTempDirectory("graft-warc-big")
    def rec(i: Int): String =
      s"WARC/1.0\nWARC-Type: response\n" +
        s"WARC-Target-URI: https://www.site$i.example.com/\n" +
        s"WARC-Record-ID: rec-$i\nContent-Length: 52\n\n" +
        s"<html><head><title>Site$i | Site</title></head><body>x</body></html>\n"
    val n = 1500
    write(dir, "seg.warc", (1 to n).map(rec).mkString(""))
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val df = Extraction.readWarcFiles(spark, dir.toString)
      assert(df.rdd.getNumPartitions > 1,
        s"one segment must split into many tasks, got ${df.rdd.getNumPartitions}")
      val parsed = Extraction.parseWarcRecords(df)
      assert(parsed.count() == n)
      val ids = parsed.select("record_id").collect().map(_.getString(0)).toSet
      assert(ids == (1 to n).map(i => s"rec-$i").toSet)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
    }
  }
}
