package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global top-k with a dense 1..k rank column.
  *
  * `orderBy(...).limit(k)` plans as TakeOrderedAndProject: every
  * partition keeps a bounded k-row heap and the driver merges the
  * partial results, so no partition ever holds more than k rows. The
  * naive formulation — an unpartitioned `row_number` window +
  * `rank <= k` filter — instead moves the ENTIRE input into one
  * partition to sort it (WindowExec warns "No Partition Defined ...
  * single partition"), which is the #1 scale-killer for corpus-wide
  * rankings (vocabulary stats, global nearest neighbors, leaderboards).
  *
  * The rank column is recovered by a residual row_number window over
  * the already-limited result, so that window's input is at most k
  * rows regardless of corpus size. The `order` must be a total order
  * (include a unique-key tiebreak) so limit and rank agree.
  */
object TopK {
  def globalWithRank(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
      .orderBy("rank")
}
