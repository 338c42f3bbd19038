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

  // ---- v2: more point types, outer joins ----

  test("v2: INT point columns fire the rewrite, rows unchanged") {
    import spark.implicits._
    val pI = (0 until 2000).map(i => (i.toLong, (i * 13) % 5000)).toDF("pid", "t")
    val ivI = Seq((1L, 0, 40), (2L, 95, 210), (3L, 400, 4000), (5L, 4990, 5200))
      .toDF("iid", "s", "e")
    val naiveI = pI.join(ivI, col("t") >= col("s") && col("t") < col("e"))
    val expected = naiveI.select("pid", "iid").collect().toSet
    withWidth(100L) {
      val p = naiveI.queryExecution.executedPlan.toString
      assert(p.contains("__binp") && !p.contains("BroadcastNestedLoopJoin"),
        s"int-typed containment must fire the rewrite:\n$p")
      assert(naiveI.select("pid", "iid").collect().toSet == expected,
        "the int rewrite changed the row set")
    }
  }

  test("v2: TIMESTAMP point columns fire with µs-exact bins, rows unchanged") {
    import spark.implicits._
    // sub-second bounds: a seconds-truncating normalization would merge
    // them; micros must not
    val pT = (0L until 3000L).map(i => (i, (i * 137) % 2000000L))
      .toDF("pid", "us").select(col("pid"), timestamp_micros(col("us")).as("t"))
    val ivT = Seq((1L, 0L, 400000L), (2L, 399999L, 400001L), (3L, 1500000L, 1900000L))
      .toDF("iid", "s_us", "e_us")
      .select(col("iid"), timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"))
    val naiveT = pT.join(ivT, col("t") >= col("s") && col("t") < col("e"))
    val expected = naiveT.select("pid", "iid").collect().toSet
    assert(expected.nonEmpty)
    withWidth(500000L) { // 0.5 s bins, in MICROseconds
      val p = naiveT.queryExecution.executedPlan.toString
      assert(p.contains("__binp") && !p.contains("BroadcastNestedLoopJoin"),
        s"timestamp containment must fire the rewrite:\n$p")
      assert(naiveT.select("pid", "iid").collect().toSet == expected,
        "the timestamp rewrite changed the row set")
    }
  }

  test("v2: LEFT join with points preserved fires; unmatched points null-extend once") {
    val naiveL = points.join(intervals,
      col("t") >= col("s") && col("t") < col("e"), "left")
    val expected = naiveL.select("pid", "iid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    withWidth(100L) {
      val p = naiveL.queryExecution.executedPlan.toString
      assert(p.contains("__binp"), s"left-outer containment must fire:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop survived:\n$p")
      val got = naiveL.select("pid", "iid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got == expected,
        "left-outer rewrite changed the multiset (duplicate or lost null-extensions?)")
    }
  }

  test("v2: LEFT join preserving the INTERVAL side must NOT fire (bin copies would duplicate)") {
    val df = intervals.join(points,
      col("t") >= col("s") && col("t") < col("e"), "left")
    withWidth(100L) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("__binp"),
        "a left join preserving the exploded side would null-extend once per bin copy")
    }
  }

  test("v2: RIGHT join with points preserved fires and matches the naive rows") {
    val naiveR = intervals.join(points,
      col("t") >= col("s") && col("t") < col("e"), "right")
    val expected = naiveR.select("pid", "iid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    withWidth(100L) {
      val p = naiveR.queryExecution.executedPlan.toString
      assert(p.contains("__binp"), s"right-outer containment must fire:\n$p")
      val got = naiveR.select("pid", "iid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got == expected, "right-outer rewrite changed the multiset")
    }
  }
}
