package graft

/** Round-12 scratch-disk valve: PlanCache releases LIVE family caches
  * whose (census ∪ observed) consumers have all run, protects entries
  * with a known FUTURE consumer behind an 8x idle floor under
  * pressure, and evicts census-unknown idle entries at the base floor
  * — the r11 sf10 sweep's 4 ENOSPC kills were exactly spent caches
  * nobody would read again pinning ~70 GB of scratch.
  */
class R12ValveSpec extends SparkSpec {

  test("releaseAfter: spent census entries release proactively; " +
      "future-consumer entries survive the pressure floor; " +
      "census-unknown idle entries evict under pressure only") {
    val dir = "/tmp/valve_spec_dir"
    PlanCache.invalidate(dir)
    PlanCache.beginConsumer("qa", 0)
    PlanCache.cached("valve_a", spark, dir)(spark.range(3).toDF)
    PlanCache.beginConsumer("qb", 1)
    PlanCache.cached("valve_b", spark, dir)(spark.range(4).toDF)
    PlanCache.cached("valve_u", spark, dir)(spark.range(5).toDF)
    // census knows a and b; valve_u is a census-unknown regime cache.
    // valve_b still has a future consumer qz.
    val census = Map(
      "valve_a" -> Set("qa"),
      "valve_b" -> Set("qa", "qb", "qz"))

    // no pressure, qa+qb ran: only the spent valve_a releases
    val ev1 = PlanCache.releaseAfter(dir, Set("qa", "qb"), census,
      pressure = false)
    assert(ev1 == Seq("valve_a"))

    // pressure at epoch 3: valve_b idle 2 but has future consumer qz
    // (floor 16), valve_u idle 2 and census-unknown (floor 2) — only
    // valve_u evicts
    PlanCache.beginConsumer("qc", 3)
    val ev2 = PlanCache.releaseAfter(dir, Set("qa", "qb", "qc"), census,
      pressure = true)
    assert(ev2 == Seq("valve_u"))

    // qz runs: valve_b is now spent and releases without pressure
    PlanCache.beginConsumer("qz", 4)
    PlanCache.cached("valve_b", spark, dir)(spark.range(4).toDF)
    val ev3 = PlanCache.releaseAfter(dir, Set("qa", "qb", "qc", "qz"),
      census, pressure = false)
    assert(ev3 == Seq("valve_b"))

    // an evicted entry rebuilds transparently on the next touch
    PlanCache.beginConsumer("qa2", 5)
    assert(PlanCache.cached("valve_a", spark, dir)(spark.range(3).toDF)
      .count() == 3)
    PlanCache.invalidate(dir)
    PlanCache.beginConsumer("", 0)
  }

  test("releaseAfter never touches entries under another dir") {
    val d1 = "/tmp/valve_spec_d1"
    val d2 = "/tmp/valve_spec_d2"
    PlanCache.invalidate(d1); PlanCache.invalidate(d2)
    PlanCache.beginConsumer("qx", 0)
    PlanCache.cached("valve_x", spark, d1)(spark.range(2).toDF)
    PlanCache.cached("valve_x", spark, d2)(spark.range(2).toDF)
    val ev = PlanCache.releaseAfter(d1, Set("qx"),
      Map("valve_x" -> Set("qx")), pressure = false)
    assert(ev == Seq("valve_x"))
    // the d2 twin survived: a second release under d2 still finds it
    val ev2 = PlanCache.releaseAfter(d2, Set("qx"),
      Map("valve_x" -> Set("qx")), pressure = false)
    assert(ev2 == Seq("valve_x"))
    PlanCache.beginConsumer("", 0)
  }
}
