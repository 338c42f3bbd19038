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
    *
    * The inputs must occupy COMPARABLE bit widths: the curve alternates
    * bits, so a 20-bit column interleaved with an 11-bit one contributes
    * all of the code's high bits and the sort degenerates to a 1-D sort on
    * the wide column (ZOrderScaleProbe demonstrates exactly this failure —
    * user-slice pruning power collapses to zero). Normalize skewed domains
    * through `zBucket` first; constant high bits (e.g. an epoch-hour index
    * whose top bits never vary within the dataset) are harmless — identical
    * across rows, they do not affect the ordering.
    */
  def morton2(x: Column, y: Column): Column =
    spreadBits(x.cast("long"))
      .bitwiseOR(shiftleft(spreadBits(y.cast("long")), 1))

  /** Spread the low 21 bits of a non-negative long so bit i lands at bit
    * 3i — the 3-D analogue of spreadBits (the classic part-1-by-2 mask
    * pyramid; 21 bits × 3 = 63, fitting a signed long).
    */
  def spreadBits3(c: Column): Column = {
    val v0 = c.bitwiseAND(lit(0x1FFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 32)).bitwiseAND(lit(0x001F00000000FFFFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 16)).bitwiseAND(lit(0x001F0000FF0000FFL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    val v4 = v3.bitwiseOR(shiftleft(v3, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    v4.bitwiseOR(shiftleft(v4, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** 63-bit Morton code of THREE non-negative ints/longs < 2^21 (x in bits
    * 0,3,6…, y in 1,4,7…, z in 2,5,8…). Each column keeps ~one third of
    * its resolution — the locality trade grows with dimension count, which
    * is why Z-ordering past 3–4 columns stops paying (each added column
    * dilutes EVERY column's pruning power; ZOrderScaleProbe measures the
    * 2-vs-3-column trade quantitatively). Inputs wider than 21 bits must
    * normalize through `zBucket(c, max, bits ≤ 21)` first — the same
    * comparable-bit-width requirement as morton2, one third tighter.
    */
  def morton3(x: Column, y: Column, z: Column): Column =
    spreadBits3(x.cast("long"))
      .bitwiseOR(shiftleft(spreadBits3(y.cast("long")), 1))
      .bitwiseOR(shiftleft(spreadBits3(z.cast("long")), 2))

  /** Hilbert-curve index of two coordinates in [0, 2^bits) — the layout
    * alternative to morton2 with strictly better range-predicate locality
    * (continuous curve, no Z-seam jumps; see HilbertExpr's scaladoc for the
    * full account and the conversion-cost trade). Same normalization
    * contract as morton2: comparable bit widths, zBucket skewed domains.
    */
  def hilbert2(x: Column, y: Column, bits: Int): Column =
    HilbertExpr(x, y, bits)

  /** Scale a non-negative column with known domain [0, maxExclusive) onto
    * [0, 2^bits): `(c · 2^bits) div maxExclusive`, exact decimal arithmetic
    * (codegen'd), monotone, endpoints tight. This is the per-column
    * range-bucketing Delta's OPTIMIZE ZORDER applies before interleaving —
    * it is what makes two columns of wildly different domains contribute
    * bits at the same rate.
    */
  def zBucket(c: Column, maxExclusive: Long, bits: Int): Column = {
    require(maxExclusive > 0, s"maxExclusive=$maxExclusive")
    require(bits >= 1 && bits <= 31, s"bits=$bits")
    floor(c.cast("decimal(38,0)") * lit(1L << bits) / lit(maxExclusive))
      .cast("long")
  }
}
