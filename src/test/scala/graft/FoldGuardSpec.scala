package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fold kernels' malformed-input contract (r16, ADVICE): a dimension
  * mismatch or a null ELEMENT fails loudly instead of silently reading
  * out-of-bounds / zero-filled UnsafeArrayData words, while a null ARRAY
  * still propagates null (BinaryExpression null-intolerance, matching the
  * HOF forms).
  */
class FoldGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def frame(a: Seq[java.lang.Float], b: Seq[java.lang.Float]) = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
  }

  test("dimension mismatch throws, for both fold kernels") {
    val df = frame(Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))
    val e1 = intercept[Exception] {
      df.select(VectorOps.l2Col(col("a"), col("b"))).collect()
    }
    assert(e1.toString.contains("dimension mismatch") ||
      Option(e1.getCause).exists(_.toString.contains("dimension mismatch")))
    val e2 = intercept[Exception] {
      df.select(VectorOps.dotCol(col("a"), col("b"))).collect()
    }
    assert(e2.toString.contains("dimension mismatch") ||
      Option(e2.getCause).exists(_.toString.contains("dimension mismatch")))
  }

  test("null element throws loudly (not 0.0-substituted)") {
    val df = frame(Seq(1.0f, null, 3.0f), Seq(1.0f, 2.0f, 3.0f))
    val e = intercept[Exception] {
      df.select(VectorOps.l2Col(col("a"), col("b"))).collect()
    }
    assert(e.toString.contains("null element") ||
      Option(e.getCause).exists(_.toString.contains("null element")))
  }

  test("null ARRAY yields null, equal well-formed vectors yield 0 / dot") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 2.0f)), Seq(1.0f, 2.0f)))
      .toDF("a", "b")
      .union(Seq((Option.empty[Seq[Float]], Seq(1.0f, 2.0f))).toDF("a", "b"))
    val rows = df.select(
      VectorOps.l2Col(col("a"), col("b")).as("l2"),
      VectorOps.dotCol(col("a"), col("b")).as("dt")).collect()
    val byNull = rows.partition(_.isNullAt(0))
    assert(byNull._1.length == 1 && byNull._1.head.isNullAt(1))
    assert(byNull._2.head.getDouble(0) == 0.0 && byNull._2.head.getDouble(1) == 5.0)
  }
}
