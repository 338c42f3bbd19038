package graft

import graft.events.EventOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed sessionizer's contract: row-identical to `sessionStats` at
  * EVERY bucket width — including degenerate ones where every event is its
  * own slice (all stitching) or one slice holds everything (no stitching) —
  * and a plan whose big window partitions by (user, slice), not the user
  * alone.
  */
class EventSessionBucketedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def parity(df: org.apache.spark.sql.DataFrame, gapSec: Int,
                     bucketSec: Long): Unit = {
    val plain = EventOps.sessionStats(df, gapSec)
      .select("user_id", "session_seq", "n_events", "start_es", "end_es",
        "sum_value_micros", "duration_sec")
    val bucketed = EventOps.sessionStatsBucketed(df, gapSec, bucketSec)
      .select("user_id", "session_seq", "n_events", "start_es", "end_es",
        "sum_value_micros", "duration_sec")
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty,
      s"bucketSec=$bucketSec diverged from the plain sessionizer")
  }

  private def fixture = Tables.events(spark, TestSpark.sf0001)

  test("fixture parity across widths, including degenerate ones") {
    // 6 h (the registered width), exactly the gap, narrower than the gap
    // (every session stitches boundaries), and wider than the whole range
    for (w <- Seq(21600L, 1800L, 60L, 10000000000L))
      parity(fixture, gapSec = 1800, bucketSec = w)
  }

  test("a session chaining across 3+ slices stitches into one, numbering intact") {
    import spark.implicits._
    // user 1: events every 50 s across 400 s (one session spanning 4+
    // 100 s slices), then a 5000 s silence, then a second session; user 2:
    // a lone event. ts_ns = es * 1e9.
    val rows =
      ((0 to 8).map(i => (1L, i.toLong, i * 50L)) ++
        Seq((1L, 100L, 5400L), (1L, 101L, 5450L), (2L, 200L, 7L)))
        .map { case (u, eid, es) => (eid, es * 1000000000L, u, "click", 1.0, "{}") }
    val df = rows.toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")
    parity(df, gapSec = 100, bucketSec = 100L)
    val b = EventOps.sessionStatsBucketed(df, gapSec = 100, bucketSec = 100L)
    val u1 = b.filter(col("user_id") === 1L)
      .orderBy("session_seq")
      .select("session_seq", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(u1.toSeq == Seq((1L, 9L), (2L, 2L)),
      s"slice-chained session split or misnumbered: ${u1.toSeq}")
  }

  test("boundary gap exactly equal to gapSec stitches; gap+1 breaks") {
    import spark.implicits._
    def mk(secondEs: Long) = Seq(
      (0L, 95L * 1000000000L, 9L, "click", 1.0, "{}"),
      (1L, secondEs * 1000000000L, 9L, "click", 1.0, "{}"))
      .toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")
    for (es <- Seq(125L, 126L)) { // slice boundary at 100 with W=50, gap=30
      parity(mk(es), gapSec = 30, bucketSec = 50L)
      val n = EventOps.sessionStatsBucketed(mk(es), 30, 50L).count()
      assert(n == (if (es == 125L) 1 else 2), s"es=$es gave $n sessions")
    }
  }

  test("the event-level window partitions by (user, slice), not the user alone") {
    val p = EventOps.sessionStatsBucketed(fixture, 1800, 21600L)
      .queryExecution.executedPlan.toString
    val eventWindows = p.linesIterator
      .filter(l => l.contains("Window ") && l.contains("__brk")).toSeq
    assert(eventWindows.nonEmpty, "lost the within-slice window")
    assert(eventWindows.forall(l => l.contains("__bkt")),
      s"the big window must partition by (user_id, __bkt): $eventWindows")
    assert(!p.contains("CartesianProduct"), "stitch join degraded to a cartesian")
  }
}
