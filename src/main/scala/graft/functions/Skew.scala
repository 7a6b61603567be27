package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tools for joins whose key cardinality is far below the
  * cluster's parallelism (or whose key distribution is heavy-tailed).
  * AQE's skew-join splits oversized *partitions*, but a 5-value block
  * key still yields ≤5 tasks — salting fixes the task count itself.
  */
object Skew {

  /** Equi-join left⋈right on `keys` with `salts`-way fan-out: the
    * left side gets a deterministic salt from `saltBy`, the right
    * side replicates across all salts. Same rows out, `salts`× the
    * parallelism in.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBy: Column, salts: Int): DataFrame = {
    val l = left.withColumn("_salt", pmod(saltBy, lit(salts)).cast("int"))
    val r = right.withColumn("_salt", explode(expr(s"sequence(0, ${salts - 1})")))
    l.join(r, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase count-distinct for skewed keys. Algebraic aggregates
    * (sum/count/min/max) partial-aggregate map-side, so key skew
    * barely hurts them — but countDistinct must co-locate every
    * distinct value of a key in ONE task, and a hot key's value set
    * can exceed an executor. Phase 1 splits each key's value space
    * deterministically by value-hash into `salts` shards and counts
    * distinct per shard (each shard holds a disjoint value subset, so
    * counts add exactly); phase 2 sums the shard counts. Exact, not a
    * sketch — the memory per task drops by `salts`×.
    */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], value: Column,
                          salts: Int, out: String = "n_distinct"): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_vshard", pmod(hash(value), lit(salts)))
      .groupBy(keyCols :+ col("_vshard"): _*)
      .agg(countDistinct(value).as("_part"))
      .groupBy(keyCols: _*)
      .agg(sum("_part").as(out))
  }
}
