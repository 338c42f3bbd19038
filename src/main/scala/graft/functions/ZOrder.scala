package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data CLUSTERING —
  * the layout trick behind Delta/Iceberg's OPTIMIZE ZORDER BY: sort-write
  * data by the bit-interleaved key of two filter columns and BOTH columns'
  * min/max ranges stay narrow within every file and row group, so a
  * selective predicate on EITHER (or both) prunes at the parquet
  * row-group-statistics level. A single-column sort gives that property to
  * one column only; Z-order shares it between them (each loses ~half its
  * resolution — the locality trade every space-filling curve makes).
  *
  * Pure `Column` arithmetic (shift/mask bit spreading, the classic magic
  * numbers) — whole-stage-codegen'd, no UDF, replayable in any engine with
  * bit ops. Inputs are clamped to [0, 2^31): at that width both spread
  * halves fit a 64-bit long with bits to spare.
  */
object ZOrder {

  /** Spread the low 32 bits of a non-negative long so bit i lands at bit
    * 2i: the standard 5-step mask-shift pyramid.
    */
  def spreadBits(c: Column): Column = {
    val v0 = c.bitwiseAND(lit(0xFFFFFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val v4 = v3.bitwiseOR(shiftleft(v3, 2)).bitwiseAND(lit(0x3333333333333333L))
    v4.bitwiseOR(shiftleft(v4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton code of two non-negative ints/longs < 2^31 (x in the
    * even bits, y in the odd). Monotone in each coordinate along the curve's
    * axes, which is what keeps per-file min/max ranges tight on both.
    */
  def morton2(x: Column, y: Column): Column =
    spreadBits(x.cast("long"))
      .bitwiseOR(shiftleft(spreadBits(y.cast("long")), 1))
}
