package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Round-8 batch 10: empirical-Bayes rate shrinkage and the
  * FDR-controlled per-metric A/B family. Local recompute pins.
  */
class R8Batch10Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniform(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) / math.pow(16, 8)

  test("part_return_eb_rates matches a local Beta-Binomial MoM recompute") {
    val out = operators.Olap.partReturnEbRates(spark, sf).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r).toMap
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_returnflag").collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[String]("l_returnflag")))
    val per = li.groupBy(_._1).map { case (p, rows) =>
      (p, rows.length.toLong, rows.count(_._2 == "R").toLong)
    }.toSeq.sortBy(_._1)
    val rates = per.map { case (_, n, x) => x.toDouble / n }
    val pCnt = rates.length
    val sr = rates.sum; val sr2 = rates.map(r => r * r).sum
    val mu = sr / pCnt
    val v = sr2 / pCnt - (sr / pCnt) * (sr / pCnt)
    val s0 = if (v > 0 && mu > 0 && mu < 1) Some(mu * (1 - mu) / v - 1) else None
    val s = s0.filter(_ > 0)
    assert(out.size == per.size)
    for ((p, n, x) <- per) {
      val r = out(p)
      val raw = x.toDouble / n
      val shrunk = s.map(ss => (x + mu * ss) / (n + ss)).getOrElse(raw)
      assert(r.getAs[Long]("n_lines") == n)
      assert(r.getAs[Long]("n_returned") == x)
      assert(r.getAs[Double]("raw_rate") == round6(raw))
      assert(r.getAs[Double]("shrunk_rate") == round6(shrunk), s"part $p")
      // shrinkage contracts toward the prior mean, never past it
      if (s.isDefined && math.abs(raw - mu) > 1e-9) {
        val d0 = math.abs(raw - mu); val d1 = math.abs(shrunk - mu)
        assert(d1 < d0 + 1e-12, s"part $p moved away from the prior")
      }
    }
    // the fit is real on this corpus (non-degenerate moments)
    assert(s.isDefined && out.values.head.getAs[Double]("prior_strength") > 0)
  }

  test("events_ab_pvalues_fdr matches a local Welch-z + BH recompute") {
    val out = operators.Events.eventsAbPvaluesFdr(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    val users = ev.map(_._1).distinct
    val types = ev.map(_._2).distinct
    val counts = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val stats = types.map { t =>
      val (a, b) = users.partition(u => uniform(u.toString) < 0.5)
      def suf(us: Seq[Long]) = {
        val cs = us.map(u => counts.getOrElse((u, t), 0L))
        (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
      }
      val (na, sa, ssa) = suf(a); val (nb, sb, ssb) = suf(b)
      val ma = sa.toDouble / na; val mb = sb.toDouble / nb
      val va = ssa.toDouble / na - ma * ma
      val vb = ssb.toDouble / nb - mb * mb
      val z = (mb - ma) / math.sqrt(va / na + vb / nb)
      val az = math.abs(z)
      val tt = 1.0 / (1.0 + 0.2316419 * az)
      val poly = tt * (0.319381530 + tt * (-0.356563782 + tt * (1.781477937
        + tt * (-1.821255978 + tt * 1.330274429))))
      val p = round6(math.min(
        2.0 * math.exp(-az * az / 2.0) * 0.3989422804014327 * poly, 1.0))
      (t, na, nb, round6(ma), round6(mb), round6(z), p)
    }
    val m = stats.length
    val ranked = stats.sortBy(x => (x._7, x._1)).zipWithIndex
      .map { case (x, i) => (x, i + 1) }
    // BH suffix min of p*m/rank
    val padj = ranked.map { case (x, rk) => x._7 * m / rk }
    val q = padj.indices.map(i => round6(math.min(padj.drop(i).min, 1.0)))
    for (((x, rk), i) <- ranked.zipWithIndex) {
      val r = out(x._1)
      assert(r.getAs[Long]("n_a") == x._2 && r.getAs[Long]("n_b") == x._3)
      assert(r.getAs[Double]("mean_a") == x._4)
      assert(r.getAs[Double]("mean_b") == x._5)
      assert(r.getAs[Double]("z") == x._6, s"type ${x._1}")
      assert(r.getAs[Double]("p_value") == x._7)
      assert(r.getAs[Int]("rank") == rk)
      assert(r.getAs[Double]("q_value") == q(i), s"type ${x._1} q")
      assert(r.getAs[Long]("significant") == (if (q(i) <= 0.05) 1L else 0L))
    }
    // q is monotone along the rank order (the BH step-up guarantee)
    val qs = out.values.toSeq.sortBy(_.getAs[Int]("rank"))
      .map(_.getAs[Double]("q_value"))
    assert(qs.zip(qs.tail).forall { case (a, b) => a <= b })
  }
}
