package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins graft.functions.JaroWinkler to DuckDB's
  * jaro_winkler_similarity on probed reference values (so the
  * match_jaro oracle can hash-match), and pins the codegen path to
  * the interpreted one.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    functions.JaroWinkler.sim(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches DuckDB jaro_winkler_similarity on reference cases") {
    val cases = Seq(
      // (a, b, duckdb value) — probed from duckdb 2026-08-12
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("", "", 0.0),
      ("a", "", 0.0),
      ("abc", "abc", 1.0),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("DwAyNE", "DuANE", 0.8400000000000001),
      // boost threshold: jaro <= 0.7 gets NO prefix boost
      ("abcdefghij", "abcdzzzzzzzzzz", 0.5619047619047619),
      ("abqqqq", "abzzzz", 0.5555555555555555),
      ("ab", "az", 0.6666666666666666),
      // boost cap at prefix length 4
      ("aaaaaaaaaab", "aaaaaaaaaaz", 0.9636363636363636),
      ("prefix", "prefixtotallydiff", 0.8705882352941177),
      ("ab", "ba", 0.0),
      // non-ASCII: DuckDB compares UTF-8 BYTES ('café' = 5 units)
      ("café", "cafe", 0.8483333333333334),
      ("münchen", "munchen", 0.8821428571428571),
      ("naïve", "naive", 0.8577777777777779))
    for ((a, b, expected) <- cases)
      assert(math.abs(jw(a, b) - expected) < 1e-12,
        s"jw($a, $b) = ${jw(a, b)}, duckdb says $expected")
  }

  test("symmetric, bounded, and exact-match maximal") {
    val words = Seq("alpha", "alpah", "beta", "betas", "gamma", "")
    for (a <- words; b <- words) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(math.abs(s - jw(b, a)) < 1e-15, s"asymmetric on ($a, $b)")
    }
    assert(jw("same", "same") == 1.0)
  }

  test("codegen and interpreted paths agree; SQL registration works") {
    import spark.implicits._
    val df = Seq(("cold widget", "bold widget"), ("large bolt", "large belt"))
      .toDF("a", "b")
    val viaExpr = df.select(
      functions.JaroWinkler.sim(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    val viaSql = df.selectExpr("graft_jaro_winkler(a, b) AS s")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaExpr == viaSql)
    val direct = Seq(jw("cold widget", "bold widget"), jw("large bolt", "large belt"))
    assert(viaExpr.zip(direct).forall { case (x, y) => math.abs(x - y) < 1e-15 })
  }
}
