package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index — the OTHER space-filling layout key beside Morton
  * (ZOrder.morton2), and the strictly-better one for RANGE predicates: the
  * Hilbert curve is CONTINUOUS (consecutive indices are always grid
  * neighbors — ZOrderSpec proves it cell-by-cell), so a contiguous run of
  * the sort order tiles the plane in connected blobs with no Morton "Z
  * jumps" (the long diagonal seams where the Z curve teleports across the
  * quadrant boundary and a sort chunk picks up two far-apart rectangles,
  * widening its min/max on both columns). Delta Lake added exactly this as
  * OPTIMIZE ... CLUSTER BY (liquid clustering, Hilbert default) after
  * shipping Morton for years — same reason.
  *
  * The trade: the index is NOT per-axis bit-decomposable (Morton's
  * even/odd-bit structure is what makes morton2 five mask-shifts), so the
  * conversion is the classic per-level rotate-and-flip walk (Hamilton's
  * compact algorithm, here the standard Wikipedia xy2d form) — a sequential
  * `bits`-step loop. As a naive `Column` composition each step references
  * the previous step's (x, y) several times and the expression TREE grows
  * exponentially; this is therefore a native Catalyst expression (the
  * Md5ModExpr pattern): one static Java loop, interpreted and codegen'd
  * identically, no barrier, no UDF encoder round-trip.
  *
  * Both coordinates must already lie in [0, 2^bits) — same comparable-
  * bit-width contract as morton2 (normalize skewed domains through
  * ZOrder.zBucket); out-of-range inputs fail loudly rather than silently
  * folding distant rows onto the same curve cell.
  */
case class HilbertExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert2"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bits < 1 || bits > 31)
      TypeCheckResult.TypeCheckFailure(s"$prettyName bits=$bits outside [1, 31]")
    else (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two BIGINT inputs, got ${lt.sql} and ${rt.sql}")
    }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertExpr.xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.HilbertExpr.xy2d($bits, $x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertExpr {
  /** Static entry shared by interpreted eval and generated code: the
    * standard xy2d walk — per level s (MSB → LSB), the quadrant's Gray-coded
    * rank scales by s², then the lower bits rotate/flip into the
    * sub-square's frame (flip uses the FULL side n−1; the folded high bits
    * are ignored by later levels' masks).
    */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    if (x0 < 0 || y0 < 0 || x0 >= n || y0 >= n)
      throw new IllegalArgumentException(
        s"hilbert2: coordinate ($x0, $y0) outside [0, 2^$bits) — " +
          "normalize through ZOrder.zBucket first")
    var x = x0; var y = y0; var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def apply(x: Column, y: Column, bits: Int): Column =
    GraftColumnBridge.column(HilbertExpr(
      GraftColumnBridge.expression(x.cast("long")),
      GraftColumnBridge.expression(y.cast("long")), bits))
}
