package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Semi-structured extraction — the reference's extraction layer
  * re-expressed as columnar parsers:
  *
  *  - ABR XML field extraction with multi-path fallbacks
  *    (extract_abr_xml.py:44-117 get_entity_name / get_address /
  *    extract_with_fallback);
  *  - Common-Crawl HTML company-name extraction with the
  *    og:site_name → JSON-LD → title fallback chain
  *    (extract_common_crawl.py extract_company_info).
  *
  * The testdata has no raw XML/HTML, so each query synthesizes the
  * markup deterministically from table columns, then parses it back —
  * the parse logic is the operator under test, and it is pure
  * regexp_extract column math (codegen'd, partition-parallel, no
  * driver involvement — unlike the reference's ElementTree loop).
  */
object Extraction {

  /** Deterministic ABR-style XML per customer; 1/4 of rows use the
    * person-name variant to exercise the fallback path.
    */
  private def synthXml: Column = {
    val abn = format_string("%011d", col("c_custkey"))
    val status = when(col("c_custkey") % 3 === 0, "ACT").otherwise("CAN")
    val orgName = concat(lit("<MainEntity><NonIndividualName><NonIndividualNameText>"),
      col("c_name"), lit("</NonIndividualNameText></NonIndividualName></MainEntity>"))
    val personName = concat(lit("<LegalEntity><IndividualName><GivenName>Given"),
      col("c_custkey"), lit("</GivenName><FamilyName>Family"),
      col("c_nationkey"), lit("</FamilyName></IndividualName></LegalEntity>"))
    concat(
      lit("<ABR><ABN status=\""), status, lit("\">"), abn, lit("</ABN>"),
      lit("<EntityType><EntityTypeText>"), col("c_mktsegment"),
      lit("</EntityTypeText></EntityType>"),
      when(col("c_custkey") % 4 === 0, personName).otherwise(orgName),
      lit("<BusinessAddress><AddressDetails><State>S"), col("c_nationkey"),
      lit("</State><Postcode>"),
      format_string("%04d", col("c_nationkey") * 100 + col("c_custkey") % 100),
      lit("</Postcode></AddressDetails></BusinessAddress></ABR>"))
  }

  /** Parse the synthesized XML back out with the reference's fallback
    * chain: org name first, else given+family composition.
    */
  def extractXmlEntities(spark: SparkSession, dir: String): DataFrame = {
    val xml = Tables.customer(spark, dir).select(synthXml.as("xml"))
    val org = regexp_extract(col("xml"),
      "<NonIndividualNameText>([^<]*)</NonIndividualNameText>", 1)
    val given = regexp_extract(col("xml"), "<GivenName>([^<]*)</GivenName>", 1)
    val family = regexp_extract(col("xml"), "<FamilyName>([^<]*)</FamilyName>", 1)
    xml.select(
      regexp_extract(col("xml"), "<ABN[^>]*>([0-9]+)</ABN>", 1).as("abn"),
      when(org =!= "", org).otherwise(trim(concat(given, lit(" "), family)))
        .as("entity_name"),
      regexp_extract(col("xml"), "<ABN status=\"([A-Z]+)\"", 1).as("entity_status"),
      regexp_extract(col("xml"), "<EntityTypeText>([^<]*)</EntityTypeText>", 1)
        .as("entity_type"),
      regexp_extract(col("xml"), "<State>([^<]*)</State>", 1).as("state"),
      regexp_extract(col("xml"), "<Postcode>([0-9]+)</Postcode>", 1).as("postcode"))
      .orderBy("abn")
  }

  /** Deterministic CC-style HTML per part; thirds of the corpus carry
    * the name in og:site_name, JSON-LD, or only <title>.
    */
  private def synthHtml: Column = {
    val og = concat(lit("<meta property=\"og:site_name\" content=\""),
      col("p_name"), lit(" Co\"/>"))
    val ld = concat(lit("<script type=\"application/ld+json\">{\"@type\": \"Organization\", \"name\": \""),
      col("p_name"), lit(" Org\"}</script>"))
    concat(
      lit("<html><head><title>"), col("p_name"), lit(" | Home</title>"),
      when(col("p_partkey") % 3 === 0, og)
        .when(col("p_partkey") % 3 === 1, ld)
        .otherwise(lit("")),
      lit("</head><body>"), col("p_type"), lit("</body></html>"))
  }

  /** Synthesized WARC response record per supplier (header block +
    * blank line + payload — the record shape warcio iterates in
    * extract_common_crawl.py fetch_html_from_warc).
    */
  private def synthWarc: Column =
    concat(
      lit("WARC/1.0\n"),
      lit("WARC-Type: response\n"),
      lit("WARC-Target-URI: https://www."),
      regexp_replace(lower(col("s_name")), "[^a-z0-9]+", "-"),
      lit(".example.com/\n"),
      lit("WARC-Record-ID: rec-"), col("s_suppkey"), lit("\n"),
      lit("Content-Length: "), octet_length(col("s_name")) * 3, lit("\n"),
      lit("\n"),
      lit("<html><head><title>"), col("s_name"),
      lit(" | Site</title></head><body>acct "), col("s_acctbal"),
      lit("</body></html>"))

  /** WARC record parsing: split headers from payload, type/URI/id/
    * length fields, then the payload's title — the columnar form of
    * the reference's ArchiveIterator + BeautifulSoup pass.
    */
  def extractWarcRecords(spark: SparkSession, dir: String): DataFrame = {
    val recs = Tables.supplier(spark, dir).select(synthWarc.as("rec"))
    recs.select(
      regexp_extract(col("rec"), "WARC-Type: ([^\\n]+)", 1).as("warc_type"),
      regexp_extract(col("rec"), "WARC-Target-URI: ([^\\n]+)", 1).as("target_uri"),
      regexp_extract(col("rec"), "WARC-Record-ID: ([^\\n]+)", 1).as("record_id"),
      regexp_extract(col("rec"), "Content-Length: ([0-9]+)", 1).cast("int").as("content_length"),
      trim(regexp_extract(col("rec"), "<title>([^|<]*)", 1)).as("page_title"))
      .orderBy("target_uri")
  }

  /** og:site_name → JSON-LD Organization name → title fallback chain
    * (extract_common_crawl.py extract_company_info steps 1-3), with
    * the method that won recorded per row.
    */
  def extractHtmlNames(spark: SparkSession, dir: String): DataFrame = {
    val html = Tables.part(spark, dir)
      .select(col("p_partkey"), synthHtml.as("html"))
    val og = regexp_extract(col("html"),
      "property=\"og:site_name\" content=\"([^\"]*)\"", 1)
    val ld = regexp_extract(col("html"),
      "\"@type\": \"Organization\", \"name\": \"([^\"]*)\"", 1)
    val title = trim(regexp_extract(col("html"), "<title>([^|<]*)", 1))
    html.select(
      col("p_partkey"),
      when(og =!= "", og).when(ld =!= "", ld).otherwise(title).as("company_name"),
      when(og =!= "", "og_site_name").when(ld =!= "", "json_ld")
        .otherwise("title").as("method"))
      .orderBy("p_partkey")
  }
}
