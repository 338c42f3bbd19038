package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's keyed grouping hash
  * `hash_re(s) % m` (watermarking.py:20–27): full-128-bit md5 reduced mod m.
  *
  * A real `Expression` (not a Scala UDF) so it participates in whole-stage
  * codegen as a direct static call — no encoder round-trip per row, no
  * codegen barrier. Deterministic and null-intolerant, so Catalyst remains
  * free to push, reorder, and common-subexpression-eliminate around it.
  */
case class Md5ModExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5mod"

  override protected def nullSafeEval(s: Any, m: Any): Any =
    Md5ModExpr.md5mod(s.asInstanceOf[UTF8String], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, m) => s"graft.functions.Md5ModExpr.md5mod($s, $m)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Md5ModExpr {
  /** Static entry shared by interpreted eval and generated code. */
  def md5mod(s: UTF8String, m: Long): Long = Hashing.md5Mod(s.toString, m)

  def apply(c: Column, m: Long): Column =
    GraftColumnBridge.column(Md5ModExpr(GraftColumnBridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(m)))
}
