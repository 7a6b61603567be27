package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven property pins for the native expressions — the
  * invariants that example-based specs undersample: random inputs,
  * compared against independent straight-line reference
  * implementations computed JVM-side. Inputs are generated with
  * ScalaCheck under a FIXED seed and evaluated in one Spark pass per
  * property (per-sample Spark jobs would be 200× slower).
  */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  // full-matrix reference Levenshtein (the thing BoundedLev bands)
  private def refLev(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  test("BoundedLev: exact at/above the threshold, never falsely above it") {
    import spark.implicits._
    val word = Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val pairs = sample(Gen.zip(word, word), 400, 42L)
    val out = pairs.toDF("a", "b")
      .withColumn("sim", graft.functions.BoundedLev.sim(col("a"), col("b"), 0.5))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    out.foreach { case (a, b, got) =>
      val maxLen = math.max(a.length, b.length)
      val ref = if (maxLen == 0) 1.0 else 1.0 - refLev(a, b).toDouble / maxLen
      if (ref >= 0.5)
        assert(got == ref, s"'$a' vs '$b': banded $got != exact $ref")
      if (got >= 0.5)
        assert(got == ref, s"'$a' vs '$b': claimed $got but exact is $ref")
      if (got < 0.5)
        assert(got == -1.0 || got == ref,
          s"'$a' vs '$b': below-threshold value must be exact or the -1 sentinel")
    }
  }

  // reference Morton interleave (bit loop — independent of the
  // mask-cascade formulation under test)
  private def refMorton(x: Int, y: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x.toLong >> i & 1L) << (2 * i)) | ((y.toLong >> i & 1L) << (2 * i + 1))
    }

  test("ZOrder: equals the reference interleave and preserves dominance order") {
    import spark.implicits._
    val coord = Gen.choose(0, 65535)
    val pts = sample(Gen.zip(coord, coord), 300, 7L)
    val out = pts.toDF("x", "y")
      .withColumn("z", graft.functions.ZOrder.zvalue(col("x"), col("y")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    out.foreach { case (x, y, z) =>
      assert(z == refMorton(x, y), s"($x,$y): $z != ${refMorton(x, y)}")
    }
    // dominance: componentwise <= implies morton <=
    for (Seq((x1, y1, z1), (x2, y2, z2)) <- out.toSeq.combinations(2).take(5000))
      if (x1 <= x2 && y1 <= y2) assert(z1 <= z2, s"($x1,$y1) vs ($x2,$y2)")
  }

  test("graft_hex_long: agrees with BigInt parsing on md5 prefixes") {
    import spark.implicits._
    val strs = sample(Gen.alphaNumStr.map(_.take(30)), 200, 11L)
    for (d <- Seq(1, 3, 8, 15)) {
      val out = strs.toDF("s")
        .withColumn("h", md5(col("s")))
        .withColumn("v", graft.functions.HexExprs.hexPrefixLong(md5(col("s")), d))
        .collect().map(r => (r.getString(1), r.getLong(2)))
      out.foreach { case (hex, v) =>
        assert(v == java.lang.Long.parseLong(hex.take(d), 16),
          s"digits=$d hex=$hex got=$v")
      }
    }
  }

  test("SimHash64: deterministic and token-order invariant") {
    import spark.implicits._
    val tokens = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n,
      Gen.choose(1, 8).flatMap(l => Gen.listOfN(l, Gen.alphaLowerChar).map(_.mkString))))
    val docs = sample(tokens, 200, 23L)
    val rng = new scala.util.Random(23L) // seeded: failures must reproduce
    val df = docs.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts, rng.shuffle(ts)) }
      .toDF("id", "t1", "t2")
      .withColumn("h1", graft.functions.SimHash64.simhash64(col("t1")))
      .withColumn("h2", graft.functions.SimHash64.simhash64(col("t2")))
    assert(df.filter(col("h1") =!= col("h2")).count() == 0,
      "simhash must not depend on token order")
    // deterministic across evaluations
    val again = docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      .toDF("id", "t1")
      .withColumn("h", graft.functions.SimHash64.simhash64(col("t1")))
      .select("id", "h")
    val first = df.select(col("id"), col("h1").as("h"))
    assert(first.except(again).count() == 0 && again.except(first).count() == 0)
  }
}
