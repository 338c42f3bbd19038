package graft

import graft.operators.RangeJoin
import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the RangeJoinRewrite optimizer rule: a naive interval
  * theta-join plans as a bin-keyed hash join when the rule is enabled,
  * stays a nested loop when it is not, returns exactly the un-rewritten
  * rows either way, and joins that already carry an equi-key are left
  * untouched.
  */
class RangeRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def points = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, i * 13L % 5000L)).toDF("pid", "t")
  }
  private def intervals = {
    import spark.implicits._
    Seq((1L, 0L, 40L), (2L, 95L, 210L), (3L, 400L, 4000L), (4L, 700L, 700L),
      (5L, 4990L, 5200L)).toDF("iid", "s", "e")
  }
  private def naive = points.join(intervals,
    col("t") >= col("s") && col("t") < col("e"))

  private def withWidth[A](w: Long)(body: => A): A = {
    RangeJoinRewrite.install(spark)
    spark.conf.set(RangeJoinRewrite.ConfKey, w.toString)
    try body finally spark.conf.unset(RangeJoinRewrite.ConfKey)
  }

  test("enabled: the theta-join plans as a bin equi-join, rows unchanged") {
    val expected = naive.select("pid", "iid").collect().toSet
    withWidth(100L) {
      val df = naive
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rule enabled but the nested loop survived:\n$p")
      assert(p.contains("__binp"), "the rewrite's bin key is missing")
      val got = df.select("pid", "iid").collect().toSet
      assert(got == expected, "the rewrite changed the row set")
      // and it agrees with the hand-built operator
      val manual = RangeJoin.pointInInterval(points, intervals,
        "t", "s", "e", binWidth = 100L).select("pid", "iid").collect().toSet
      assert(got == manual)
    }
  }

  test("disabled (conf unset): the naive plan keeps its nested loop") {
    RangeJoinRewrite.install(spark)
    val p = naive.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      "without a bin width the rule must not fire")
  }

  test("joins with an equi-conjunct are not rewritten") {
    import spark.implicits._
    val p2 = points.withColumn("k", col("pid") % 3)
    val iv2 = intervals.withColumn("k2", col("iid") % 3)
    withWidth(100L) {
      val df = p2.join(iv2, col("k") === col("k2") &&
        col("t") >= col("s") && col("t") < col("e"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("__binp"),
        "an equi-keyed join hash-joins already — the rewrite must stand down")
      assert(df.count() ==
        naive.withColumn("k", col("pid") % 3).filter(col("k") === col("iid") % 3).count())
    }
  }
}
