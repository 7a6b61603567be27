package graft

import org.apache.spark.sql.functions._
import graft.functions.HexExprs

class HexExprsSpec extends SparkSpec {

  test("hexPrefixLong matches the portable instr-nibble formula") {
    import spark.implicits._
    val d = Seq("hello", "world", "", "graft engine", "0").toDF("s")
      .withColumn("h", md5(col("s")))
    val rows = d.select(
      HexExprs.hexPrefixLong(col("h"), 8).as("native"),
      expr(
        """aggregate(sequence(1, 8), CAST(0 AS BIGINT),
          | (acc, i) -> acc * 16 +
          |   CAST(instr('0123456789abcdef', substring(h, i, 1)) - 1 AS BIGINT))""".stripMargin)
        .as("portable"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("non-hex characters degrade exactly like instr (-1 per char)") {
    import spark.implicits._
    val r = Seq("zz").toDF("s")
      .select(HexExprs.hexPrefixLong(col("s"), 2)).head.getLong(0)
    assert(r == -1L * 16 + -1L) // (-1)*16 + (-1) = -17
  }

  test("graft_hex_long is SQL-callable and codegen-native in the plan") {
    // literal args constant-fold away (itself proof of native
    // integration); use a column so the expression survives to the plan
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("abc".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    assert(spark.sql("SELECT graft_hex_long(md5('abc'), 8) AS v").head.getLong(0) == expected)
    Tables.documents(spark, sf).createOrReplaceTempView("hex_probe")
    val df = spark.sql("SELECT graft_hex_long(md5(text), 8) AS v FROM hex_probe")
    assert(df.head.getLong(0) >= 0L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_hex_long"))
    assert(!p.toLowerCase.contains("scalaudf"))
  }
}
