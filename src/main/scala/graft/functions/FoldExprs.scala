package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

private[functions] object FoldExprs {
  /** Both inputs must be float arrays — `getFloat` over anything else would
    * read garbage from the unsafe array words, so reject at ANALYSIS.
    */
  def checkFloatArrays(name: String, l: Expression, r: Expression): TypeCheckResult =
    (l.dataType, r.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"$name requires two ARRAY<FLOAT> inputs, got ${lt.sql} and ${rt.sql}")
    }
}

/** Native Catalyst expressions for the sequential vector folds.
  *
  * The `Column` forms in VectorOps (`aggregate(zip_with(...))`) are built
  * from higher-order functions, which Spark evaluates INTERPRETED — every
  * HOF is a whole-stage-codegen fallback, so a scoring join's generated
  * pipeline breaks at exactly its hottest expression and pays a lambda
  * closure per element per row. These are the same arithmetic as real
  * `Expression`s with `doGenCode`: one fused Java loop per row, no closure,
  * no codegen barrier.
  *
  * BIT-EXACTNESS CONTRACT: the fold order and per-element ops are byte-for-
  * byte the HOF forms' — `acc := acc + (double(a_i) − double(b_i))²` left to
  * right from 0.0, sqrt at the end — which is also `VectorOps.l2` (the
  * mapPartitions kernels) and the DuckDB `list_reduce(list_transform(...))`
  * lambda fold every oracle replays. KernelProperties pins equality against
  * the HOF form on random vectors; the full oracle surface re-proves it on
  * every Verify run. Both inputs must be float arrays of EQUAL length with
  * NO null elements — violations throw (r16; previously a short or
  * null-holding array read garbage words silently). A null ARRAY still
  * yields null (BinaryExpression null-intolerance, same as the HOF forms).
  */
case class FoldL2Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fold_l2"
  override def checkInputDataTypes(): TypeCheckResult =
    FoldExprs.checkFloatArrays(prettyName, left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FoldL2Expr.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FoldL2Expr.l2($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FoldL2Expr {
  /** Equal-length and non-null-element guard shared by the fold kernels.
    * Without it a shorter right array would silently read out-of-bounds
    * UnsafeArrayData words and a null element would read as 0.0f — garbage
    * distances with no exception. A malformed vector fails LOUDLY instead
    * (deliberately diverging from the HOF forms' null-in-null-out only on
    * inputs the engine defines as invalid: embeddings are fixed-D,
    * null-free float arrays). The null check is one bitmap word read per
    * element — measured noise next to getFloat + the fp arithmetic.
    */
  @inline private[functions] def checkPair(a: ArrayData, b: ArrayData, i: Int): Unit =
    if (a.isNullAt(i) || b.isNullAt(i))
      throw new IllegalArgumentException(
        s"graft fold kernel: null element at index $i — embeddings must be null-free")

  private[functions] def checkLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft fold kernel: dimension mismatch ($n vs ${b.numElements()})")
    n
  }

  /** Static entry shared by interpreted eval and generated code. */
  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      checkPair(a, b, i)
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(FoldL2Expr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Sequential dot product — same contract as FoldL2Expr
  * (`acc := acc + double(a_i)·double(b_i)` from 0.0), the codegen form of
  * `VectorOps.dotCol`.
  */
case class FoldDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fold_dot"
  override def checkInputDataTypes(): TypeCheckResult =
    FoldExprs.checkFloatArrays(prettyName, left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FoldDotExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FoldDotExpr.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FoldDotExpr {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = FoldL2Expr.checkLen(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      FoldL2Expr.checkPair(a, b, i)
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(FoldDotExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
