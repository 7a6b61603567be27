package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{AbrDumpFetcher, Extraction}

/** ABR ZIP acquisition seam: a REAL in-memory ZIP through a fake
  * transport — the streaming unzip, member staging, retry, zip-slip
  * flattening, and the composition into the splittable XML reader
  * and entity parser are all exercised with zero network.
  */
class AbrDumpSpec extends SparkSpec {

  private def rec(i: Int): String =
    s"""<ABR><ABN status="ACT" ABNStatusFromDate="20200115">${"%011d".format(i.toLong)}</ABN>""" +
      "<EntityType><EntityTypeText>PRV</EntityTypeText></EntityType>" +
      s"<MainEntity><NonIndividualName><NonIndividualNameText>Org $i" +
      "</NonIndividualNameText></NonIndividualName></MainEntity>" +
      "<BusinessAddress><AddressDetails><State>NSW</State><Postcode>2000" +
      "</Postcode></AddressDetails></BusinessAddress></ABR>"

  private def zipOf(members: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    members.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("fetch + unzip + splittable parse round-trips an ABR-shaped dump") {
    val zip = zipOf(
      "20991101_Public01.xml" -> (1 to 40).map(rec).mkString("\n"),
      "20991101_Public02.xml" -> (41 to 60).map(rec).mkString("\n"),
      // the bulk dump ships non-XML members too (readmes); skipped
      "readme.txt" -> "not xml",
      // zip-slip attempt must flatten to the basename, not escape
      "../evil.xml" -> rec(61))
    var calls = 0
    val fetcher = new AbrDumpFetcher(url => {
      calls += 1
      assert(url == "https://example.test/abr.zip")
      new ByteArrayInputStream(zip)
    })
    val dest = java.nio.file.Files.createTempDirectory("graft-abr").toString
    val out = fetcher.extractEntities(spark, "https://example.test/abr.zip", dest)
    val abns = out.select("abn").collect().map(_.getString(0)).sorted
    assert(abns.toSeq == (1 to 61).map(i => "%011d".format(i.toLong)),
      "every record of every XML member parses — including the flattened one")
    assert(calls == 1, "one archive, one transport call")
    // members staged as plain files; no tmp debris, nothing escaped
    // (dot-prefixed .crc sidecars are Hadoop checksum files — hidden
    // to every Spark reader, so only non-hidden names matter)
    val staged = new java.io.File(dest).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(staged.toSeq ==
      Seq("20991101_Public01.xml", "20991101_Public02.xml", "evil.xml"))
    assert(!new java.io.File(dest).getParentFile.listFiles()
      .exists(_.getName == "evil.xml"), "zip-slip path must not escape destDir")
  }

  test("transport failures retry with backoff; a failed attempt leaves no bad member") {
    val zip = zipOf("a.xml" -> rec(1))
    var calls = 0
    val flaky = new AbrDumpFetcher(_ => {
      calls += 1
      if (calls <= 2) throw new java.io.IOException(s"boom $calls")
      new ByteArrayInputStream(zip)
    }, maxRetries = 3, backoffMs = 1L)
    val dest = java.nio.file.Files.createTempDirectory("graft-abr-retry").toString
    val paths = flaky.fetchDump(spark, "u", dest)
    assert(calls == 3 && paths.length == 1)
    assert(Extraction.extractXmlFromFiles(spark, dest).count() == 1)

    val dead = new AbrDumpFetcher(_ => throw new java.io.IOException("down"),
      maxRetries = 2, backoffMs = 1L)
    val dest2 = java.nio.file.Files.createTempDirectory("graft-abr-dead").toString
    intercept[java.io.IOException](dead.fetchDump(spark, "u", dest2))
  }

  test("colliding member basenames publish under distinct names — no silent record loss") {
    // within one archive: a/part.xml + b/part.xml flatten to the same
    // basename; the second must disambiguate, both sets of records live
    val zip = zipOf(
      "a/part.xml" -> (1 to 5).map(rec).mkString("\n"),
      "b/part.xml" -> (6 to 9).map(rec).mkString("\n"))
    val fetcher = new AbrDumpFetcher(_ => new ByteArrayInputStream(zip))
    val dest = java.nio.file.Files.createTempDirectory("graft-abr-coll").toString
    val paths = fetcher.fetchDump(spark, "u", dest)
    assert(paths.length == 2 && paths.distinct.length == 2, paths.toString)
    assert(Extraction.extractXmlFromFiles(spark, dest).count() == 9)

    // across archives extracted in parallel into ONE destDir: both
    // ship "part1.xml"; the per-archive prefix keeps all records
    val zips = Map(
      "z1" -> zipOf("part1.xml" -> (1 to 7).map(rec).mkString("\n")),
      "z2" -> zipOf("part1.xml" -> (8 to 20).map(rec).mkString("\n")))
    val multi = new AbrDumpFetcher(url => new ByteArrayInputStream(zips(url)))
    val dest2 = java.nio.file.Files.createTempDirectory("graft-abr-coll2").toString
    val paths2 = multi.fetchDumps(spark, Seq("z1", "z2"), dest2)
    assert(paths2.length == 2 && paths2.distinct.length == 2, paths2.toString)
    assert(Extraction.extractXmlFromFiles(spark, dest2).count() == 20)
  }

  test("multi-archive fetch fans out per task and composes into one parse") {
    val zips = Map(
      "z1" -> zipOf("p1.xml" -> (1 to 10).map(rec).mkString("\n")),
      "z2" -> zipOf("p2.xml" -> (11 to 25).map(rec).mkString("\n")))
    val fetcher = new AbrDumpFetcher(url => new ByteArrayInputStream(zips(url)))
    val dest = java.nio.file.Files.createTempDirectory("graft-abr-multi").toString
    val paths = fetcher.fetchDumps(spark, Seq("z1", "z2"), dest)
    assert(paths.length == 2 && paths.forall(_.endsWith(".xml")))
    val out = Extraction.extractXmlFromFiles(spark, dest)
    assert(out.count() == 25)
    assert(out.select("entity_name").collect().map(_.getString(0)).toSet ==
      (1 to 25).map(i => s"Org $i").toSet)
  }
}
