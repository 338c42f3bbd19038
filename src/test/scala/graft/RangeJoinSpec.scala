package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the bin-bucketed range join: pair parity with the theta join
  * (including intervals spanning bin boundaries, shorter and longer than the
  * bin width, empty, and touching), no duplicate pairs, and the equi-join
  * plan shape that is the operator's reason to exist.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def points = {
    import spark.implicits._
    (0L until 500L).map(i => (i, i * 7L % 1000L)).toDF("pid", "t")
  }

  private def intervals = {
    import spark.implicits._
    Seq(
      (1L, 0L, 10L),      // shorter than a bin
      (2L, 95L, 105L),    // spans a bin boundary (W=100)
      (3L, 100L, 300L),   // exactly 2 bins, aligned
      (4L, 50L, 450L),    // 4× the bin width
      (5L, 700L, 700L),   // empty — matches nothing
      (6L, 998L, 1200L),  // runs past every point
      (7L, 205L, 206L))   // single tick
      .toDF("iid", "s", "e")
  }

  test("pair set equals the theta join, with no duplicate pairs") {
    val binned = RangeJoin.pointInInterval(points, intervals,
      "t", "s", "e", binWidth = 100L).select("pid", "iid")
    val brute = points.join(intervals,
        col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid")
    assert(binned.exceptAll(brute).isEmpty && brute.exceptAll(binned).isEmpty)
    assert(binned.count() == binned.distinct().count(),
      "a pair met in more than one bin")
  }

  test("extra equi-keys restrict matches to the same key") {
    import spark.implicits._
    val p = Seq(("u1", 5L, 1L), ("u2", 5L, 2L)).toDF("u", "t", "pid")
    val iv = Seq(("u1", 0L, 10L, 10L)).toDF("u", "s", "e", "iid")
    val got = RangeJoin.pointInInterval(p, iv, "t", "s", "e",
      binWidth = 8L, keys = Seq("u")).select("pid").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L), "u2's point leaked into u1's interval")
  }

  test("negative times floor-divide into the right bins") {
    import spark.implicits._
    val p = Seq((-150L, 1L), (-100L, 2L), (-1L, 3L), (0L, 4L)).toDF("t", "pid")
    val iv = Seq((-120L, 0L, 1L)).toDF("s", "e", "iid")
    val got = RangeJoin.pointInInterval(p, iv, "t", "s", "e", binWidth = 100L)
      .select("pid").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(2L, 3L), s"containment over negatives broke: ${got.toSeq}")
  }

  test("plan is an equi-join on the bin key, never a nested loop") {
    val p = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
      binWidth = 100L).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degraded to a nested loop:\n$p")
    assert(p.contains("__bin"), "the bin key vanished from the join")
  }

  // interval-overlap: a second interval family with lengths straddling the
  // bin width in both directions, plus empty / touching / containing shapes
  private def intervalsB = {
    import spark.implicits._
    Seq(
      (11L, 5L, 8L),       // inside iid 1
      (12L, 90L, 110L),    // crosses the W=100 boundary, overlaps 2 and 3
      (13L, 10L, 50L),     // touches iid 1 end-to-start (NO overlap: half-open)
      (14L, 0L, 1000L),    // contains everything non-empty below 1000
      (15L, 700L, 700L),   // empty — matches nothing, even vs 14
      (16L, 299L, 300L))   // single tick at iid 3's last instant
      .toDF("jid", "s2", "e2")
  }

  test("intervalOverlap pair set equals the theta join, with no duplicate pairs") {
    val binned = RangeJoin.intervalOverlap(intervals, intervalsB,
      "s", "e", "s2", "e2", binWidth = 100L).select("iid", "jid")
    val brute = intervals.filter(col("e") > col("s"))
      .join(intervalsB.filter(col("e2") > col("s2")),
        col("s") < col("e2") && col("s2") < col("e"))
      .select("iid", "jid")
    assert(binned.exceptAll(brute).isEmpty && brute.exceptAll(binned).isEmpty,
      "overlap pair set diverged from the theta join")
    assert(binned.count() == binned.distinct().count(),
      "a pair met in more than one bin — the max(start) rule broke")
  }

  test("intervalOverlap stays a bin-keyed equi-join, never a nested loop") {
    val p = RangeJoin.intervalOverlap(intervals, intervalsB,
        "s", "e", "s2", "e2", binWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval-overlap join degraded to a nested loop:\n$p")
    assert(p.contains("__bin"), "the bin key vanished from the join")
  }

  test("intervalOverlap honors extra equi-keys and negative times") {
    import spark.implicits._
    val a = Seq(("u1", -150L, -90L, 1L), ("u2", -150L, -90L, 2L))
      .toDF("u", "s", "e", "iid")
    val b = Seq(("u1", -100L, -50L, 10L)).toDF("u", "s2", "e2", "jid")
    val got = RangeJoin.intervalOverlap(a, b, "s", "e", "s2", "e2",
        binWidth = 100L, keys = Seq("u"))
      .select("iid").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L), s"keyed/negative overlap broke: ${got.toSeq}")
  }
}
