package graft

import graft.functions.Md5ModExpr
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session extension registering graft's custom Catalyst expressions as SQL
  * functions, so `spark.sql("SELECT graft_md5mod(content_id, 21) ...")`
  * plans the native codegen expression. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; `GraftExtensions.register`
  * does the same on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.md5ModDescriptor)
  }
}

object GraftExtensions {
  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "graft_md5mod(str, m) takes exactly 2 arguments")
    Md5ModExpr(exprs.head, exprs(1))
  }

  val md5ModDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_md5mod"),
    new ExpressionInfo(classOf[Md5ModExpr].getName, "graft_md5mod"),
    build)

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_md5mod", build, "scala_udf")
}
