package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Range-sorting a table clusters ONE column's values per file; a
  * selective filter on any other column still touches every file.
  * Interleaving the bits of two sort dimensions gives a single sort
  * key under which files are rectangles in (x, y) space — row-group
  * min/max stats prune scans on EITHER dimension. This is the layout
  * trick behind Delta/Iceberg Z-ORDER clustering, as a pure column
  * expression (codegen'd shifts and masks, no UDF).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions
    * (0babcd → 0b0a0b0c0d) via the classic mask-shift cascade.
    */
  private def spread(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two non-negative 16-bit dimensions
    * (x in even bits, y in odd). Bucketize/rank wider domains into
    * 16 bits first — for pruning, relative order is all that matters.
    */
  def zvalue(x: Column, y: Column): Column =
    spread(x.cast("long")).bitwiseOR(shiftleft(spread(y.cast("long")), 1))
}
