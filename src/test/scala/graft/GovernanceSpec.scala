package graft

import org.apache.spark.sql.functions._

/** Governance operators: cross-table expectation suite and
  * k-anonymity risk report.
  */
class GovernanceSpec extends SparkSpec {

  test("dq_expectations: FK checks pass, composite-key uniqueness genuinely fails") {
    val out = operators.Governance.dqExpectations(spark, sf).cache()
    val byName = out.collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"),
          r.getAs[String]("status"))).toMap
    assert(byName.size == 10)
    // referential integrity holds in the generated data
    Seq("fk_lineitem_orderkey_orders", "fk_lineitem_partkey_part",
      "fk_lineitem_suppkey_supplier", "fk_orders_custkey_customer")
      .foreach { c => assert(byName(c)._3 == "pass", s"$c: ${byName(c)}") }
    // the composite line key is NOT unique in the generator — the
    // suite must surface a real failure, not vacuous passes
    val (n, vUniq, st) = byName("unique_lineitem_orderkey_linenumber")
    assert(st == "fail" && vUniq > 0)
    val l = Tables.lineitem(spark, sf)
    val expect = l.count() -
      l.select("l_orderkey", "l_linenumber").distinct().count()
    assert(vUniq == expect, s"violations $vUniq != independent $expect")
    assert(n == l.count())
    // rates are consistent with (violations, rows)
    assert(out.filter(col("violation_rate") < 0 || col("violation_rate") > 1).count() == 0)
    assert(out.filter((col("n_violations") === 0) =!= (col("status") === "pass")).count() == 0)
    out.unpersist()
  }

  test("privacy_kanon: cells partition the table, at_risk flags exactly n < k") {
    val out = operators.Governance.privacyKanon(spark, sf, k = 5).cache()
    val c = Tables.customer(spark, sf)
    assert(out.agg(sum("n")).head().getLong(0) == c.count(),
      "QID cells must partition the customer table")
    assert(out.filter((col("n") < 5) =!= (col("at_risk") === 1)).count() == 0)
    // a tighter k flags a superset of cells
    val k2 = operators.Governance.privacyKanon(spark, sf, k = 10)
      .filter(col("at_risk") === 1).count()
    assert(k2 >= out.filter(col("at_risk") === 1).count())
    out.unpersist()
  }
}
