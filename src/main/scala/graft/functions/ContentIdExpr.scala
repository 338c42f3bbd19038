package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-id expression (watermarking.py:39–50) for wide key-dim
  * sets. The ≤24-dim case composes built-ins (GraftCols.contentIdCol); the
  * wide case would blow whole-stage codegen method limits as an inlined
  * expression tree, so it runs as ONE generated static call instead.
  */
case class ContentIdExpr(child: Expression, dims: Array[Int], scale: Double)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_content_id"

  override protected def nullSafeEval(vec: Any): Any =
    ContentIdExpr.compute(vec.asInstanceOf[ArrayData], dims, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dimsRef = ctx.addReferenceObj("dims", dims, "int[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.ContentIdExpr.compute($v, $dimsRef, $scale)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ContentIdExpr {
  def compute(vec: ArrayData, dims: Array[Int], scale: Double): UTF8String =
    UTF8String.fromString(Bits.contentId(vec.toFloatArray(), dims, scale))

  def apply(vec: Column, dims: Array[Int], scale: Double): Column =
    GraftColumnBridge.column(ContentIdExpr(GraftColumnBridge.expression(vec), dims, scale))
}

/** Native SCPW hidden-bit expression (SCPW.py:120–128):
  * md5(str(v[position])) % 2 XOR (md5(id) % d % 2).
  */
case class ScpwHiddenBitExpr(left: Expression, right: Expression, position: Int)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_scpw_hidden_bit"

  override protected def nullSafeEval(vec: Any, cid: Any): Any =
    ScpwHiddenBitExpr.compute(vec.asInstanceOf[ArrayData], cid.asInstanceOf[UTF8String], position)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.ScpwHiddenBitExpr.compute($v, $c, $position)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ScpwHiddenBitExpr {
  def compute(vec: ArrayData, cid: UTF8String, position: Int): Int =
    graft.watermark.Scpw.hiddenBit(vec.toFloatArray(), cid.toString, position)

  def apply(vec: Column, cid: Column, position: Int): Column =
    GraftColumnBridge.column(ScpwHiddenBitExpr(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cid), position))
}
