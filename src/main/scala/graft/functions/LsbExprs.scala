package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-vector LSB codec
  * (watermarking.py:53–117) — the hottest row-wise path (every classify,
  * embed, and extract touches every row). Compared to the Scala-UDF forms
  * these skip the encoder round-trip (no Row→Seq materialization) and join
  * whole-stage codegen as direct static calls. The key dims are a
  * per-expression constant carried as a codegen reference object.
  */
case class ExtractLsbExpr(left: Expression, right: Expression, dims: Array[Int])
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_extract_lsb"

  override protected def nullSafeEval(vec: Any, cid: Any): Any =
    LsbExprs.extract(vec.asInstanceOf[ArrayData], cid.asInstanceOf[UTF8String], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dimsRef = ctx.addReferenceObj("dims", dims, "int[]")
    defineCodeGen(ctx, ev, (v, c) => s"graft.functions.LsbExprs.extract($v, $c, $dimsRef)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class EmbedLsbExpr(first: Expression, second: Expression, third: Expression,
                        dims: Array[Int]) extends TernaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_embed_lsb"

  override protected def nullSafeEval(vec: Any, bit: Any, cid: Any): Any =
    LsbExprs.embed(vec.asInstanceOf[ArrayData], bit.asInstanceOf[Int],
      cid.asInstanceOf[UTF8String], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dimsRef = ctx.addReferenceObj("dims", dims, "int[]")
    defineCodeGen(ctx, ev, (v, b, c) => s"graft.functions.LsbExprs.embed($v, $b, $c, $dimsRef)")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object LsbExprs {
  def extract(vec: ArrayData, cid: UTF8String, dims: Array[Int]): Int =
    Bits.extractLsb(vec.toFloatArray(), dims, cid.toString)

  def embed(vec: ArrayData, bit: Int, cid: UTF8String, dims: Array[Int]): ArrayData = {
    val out = Bits.embedLsb(vec.toFloatArray(), bit, dims, cid.toString)
    new GenericArrayData(out.map(java.lang.Float.valueOf))
  }

  def extractCol(vec: Column, cid: Column, dims: Array[Int]): Column =
    GraftColumnBridge.column(ExtractLsbExpr(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cid), dims))

  def embedCol(vec: Column, bit: Column, cid: Column, dims: Array[Int]): Column =
    GraftColumnBridge.column(EmbedLsbExpr(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(bit),
      GraftColumnBridge.expression(cid), dims))
}
