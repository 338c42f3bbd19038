package graft

import graft.functions.{ContentIdExpr, EmbedLsbExpr, ExtractLsbExpr, Md5ModExpr, ScpwHiddenBitExpr}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session extension registering graft's custom Catalyst expressions as SQL
  * functions, so `spark.sql("SELECT graft_md5mod(content_id, 21) ...")`
  * plans the native codegen expressions — the full watermarking primitive
  * set is reachable from pure SQL, not just the Scala API. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; `GraftExtensions.register`
  * does the same on an existing session.
  *
  * Key-dim sets and scales are SECRET-derived constants, so the SQL surface
  * takes them as foldable literals (e.g. `array(3, 17, 41)`), evaluated once
  * at plan time into the expression's embedded constant.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(e.injectFunction)
    // conf-gated (spark.graft.rangeJoin.binWidth > 0): naive interval
    // theta-joins rewrite to the bin-bucketed equi-join instead of a BNLJ
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

object GraftExtensions {

  private def foldedIntArray(e: Expression, fn: String): Array[Int] = {
    require(e.foldable, s"$fn: the dims argument must be a literal array")
    e.eval() match {
      case a: ArrayData =>
        e.dataType match {
          case t: org.apache.spark.sql.types.ArrayType
              if t.elementType == org.apache.spark.sql.types.LongType =>
            a.toLongArray().map(_.toInt)
          case _ => a.toIntArray()
        }
      case other => throw new IllegalArgumentException(s"$fn: expected array literal, got $other")
    }
  }

  private def foldedDouble(e: Expression, fn: String): Double = {
    require(e.foldable, s"$fn: expected a numeric literal")
    e.eval() match {
      case d: java.lang.Number => d.doubleValue()
      case other => throw new IllegalArgumentException(s"$fn: expected number, got $other")
    }
  }

  private def foldedInt(e: Expression, fn: String): Int =
    foldedDouble(e, fn).toInt

  private val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_md5mod", classOf[Md5ModExpr], { exprs =>
      require(exprs.length == 2, "graft_md5mod(str, m) takes exactly 2 arguments")
      Md5ModExpr(exprs.head, exprs(1))
    }),
    ("graft_content_id", classOf[ContentIdExpr], { exprs =>
      require(exprs.length == 3, "graft_content_id(vec, dims, scale) takes exactly 3 arguments")
      ContentIdExpr(exprs.head, foldedIntArray(exprs(1), "graft_content_id"),
        foldedDouble(exprs(2), "graft_content_id"))
    }),
    ("graft_extract_lsb", classOf[ExtractLsbExpr], { exprs =>
      require(exprs.length == 3, "graft_extract_lsb(vec, cid, dims) takes exactly 3 arguments")
      ExtractLsbExpr(exprs.head, exprs(1), foldedIntArray(exprs(2), "graft_extract_lsb"))
    }),
    ("graft_embed_lsb", classOf[EmbedLsbExpr], { exprs =>
      require(exprs.length == 4, "graft_embed_lsb(vec, bit, cid, dims) takes exactly 4 arguments")
      EmbedLsbExpr(exprs.head, exprs(1), exprs(2), foldedIntArray(exprs(3), "graft_embed_lsb"))
    }),
    ("graft_scpw_hidden_bit", classOf[ScpwHiddenBitExpr], { exprs =>
      require(exprs.length == 3, "graft_scpw_hidden_bit(vec, cid, position) takes exactly 3 arguments")
      ScpwHiddenBitExpr(exprs.head, exprs(1), foldedInt(exprs(2), "graft_scpw_hidden_bit"))
    }))

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, cls, build) =>
      (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), build)
    }

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, build) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, build, "scala_udf")
    }
}
