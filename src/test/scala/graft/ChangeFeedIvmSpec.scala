package graft

import graft.sources.TableLog
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The change-feed streaming consumer's contracts (StreamOps.changeFeedIvm):
  * the maintained rollup equals the full recompute at EVERY source version,
  * a compaction landing mid-stream yields an empty delta and passes the
  * state through unchanged (only the cursor advances), and a tick with no
  * new source version is a no-op — the cursor riding the view's own commit
  * makes reprocessing idempotent (restart safety).
  */
class ChangeFeedIvmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_cfivm").toFile.getAbsolutePath

  private def rows(xs: (String, Long)*) = {
    import spark.implicits._
    xs.toDF("event_type", "us")
  }

  /** Auditing mode: one source version per tick (view history 1:1). */
  private def tick(table: String, view: String): Unit =
    StreamOps.changeFeedIvm(table, view, maxVersionsPerTick = 1)(
      spark.range(1).toDF(), 0L)

  /** Default catch-up mode: one tick folds the whole backlog. */
  private def tickAll(table: String, view: String): Unit =
    StreamOps.changeFeedIvm(table, view)(spark.range(1).toDF(), 0L)

  private def viewAt(view: String, v: Int): Map[String, (Long, Long)] =
    TableLog.read(spark, view, Some(v))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_value_micros"))).toMap

  private def recompute(table: String, v: Int): Map[String, (Long, Long)] =
    TableLog.read(spark, table, Some(v))
      .groupBy("event_type").agg(count(lit(1)), sum("us"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("the maintained view equals the full recompute at every version; compaction is a state-preserving no-op") {
    val t = tmp(); val v = tmp()
    TableLog.overwrite(rows("a" -> 10L, "a" -> 5L, "b" -> 7L), t)  // v1
    tick(t, v) // bootstrap only (head == 1)
    assert(TableLog.headVersion(v) == 1 && viewAt(v, 1) == recompute(t, 1))
    TableLog.append(rows("b" -> 3L, "c" -> 100L), t)               // v2
    TableLog.compact(spark, t)                                     // v3: empty feed
    TableLog.overwrite(rows("c" -> 1L), t)                         // v4: types vanish
    (1 to 3).foreach(_ => tick(t, v)) // cursor 1→2→3→4
    assert(TableLog.headVersion(v) == 4, "each tick advances exactly one version")
    (2 to 4).foreach { k =>
      assert(viewAt(v, k) == recompute(t, k), s"view drifted at source version $k")
    }
    // the compaction step: rows identical to v2's, only __v advanced
    assert(viewAt(v, 3) == viewAt(v, 2),
      "a compaction's empty feed must pass the state through unchanged")
    // types emptied by v4 are dropped, not kept at n=0
    assert(viewAt(v, 4).keySet == Set("c"), s"stale groups survived: ${viewAt(v, 4)}")
  }

  test("maintainView: a second view shape (two group cols) runs the same protocol") {
    import spark.implicits._
    import StreamOps.{IvmCount, IvmSum}
    val t = tmp(); val v = tmp()
    def rows2(xs: (String, String, Long)*) = xs.toDF("cat", "sub", "us")
    val tick2 = StreamOps.maintainView(t, v, Seq("cat", "sub"),
      Seq(IvmCount("cnt"), IvmSum("us", "sum_us")), maxVersionsPerTick = 1) _
    val tickAll2 = StreamOps.maintainView(t, v, Seq("cat", "sub"),
      Seq(IvmCount("cnt"), IvmSum("us", "sum_us"))) _
    def recompute2(k: Int) = TableLog.read(spark, t, Some(k))
      .groupBy("cat", "sub").agg(count(lit(1)).as("cnt"), sum("us").as("sum_us"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    def viewAt2(k: Int) = TableLog.read(spark, v, Some(k))
      .collect().map(r => (r.getAs[String]("cat"), r.getAs[String]("sub")) ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("sum_us"))).toMap
    TableLog.overwrite(rows2(("a", "x", 10L), ("a", "y", 5L), ("b", "x", 7L)), t) // v1
    tick2(spark.range(1).toDF(), 0L) // bootstrap
    assert(viewAt2(1) == recompute2(1))
    TableLog.append(rows2(("a", "x", 3L), ("c", "z", 100L)), t) // v2
    TableLog.compact(spark, t)                                  // v3: empty feed
    TableLog.overwrite(rows2(("c", "z", 1L)), t)                // v4: groups vanish
    tickAll2(spark.range(1).toDF(), 1L) // catch-up: fold v1 → v4 in ONE tick
    assert(TableLog.headVersion(v) == 2, "the backlog must fold in one tick")
    assert(viewAt2(2) == recompute2(4), "folded state drifted from recompute")
    // liveness rides the IvmCount: groups emptied by v4 are dropped
    assert(viewAt2(2).keySet == Set(("c", "z")), s"stale groups: ${viewAt2(2)}")
    // the liveness contract is enforced, not implicit
    intercept[IllegalArgumentException] {
      StreamOps.maintainView(t, v, Seq("cat"), Seq(IvmSum("us", "s")))(
        spark.range(1).toDF(), 0L)
    }
  }

  test("a version that empties the table doesn't lose the cursor") {
    val t = tmp(); val v = tmp()
    TableLog.overwrite(rows("a" -> 10L, "b" -> 7L), t) // v1
    tick(t, v)
    TableLog.overwrite(rows(), t)                      // v2: full delete
    TableLog.overwrite(rows("c" -> 3L), t)             // v3: rows return
    tick(t, v) // consumes v2 — the view state is now EMPTY (no __v row)
    assert(TableLog.read(spark, v).count() == 0,
      "the emptied state must commit as zero rows, not zero-count groups")
    tick(t, v) // the cursor must survive the empty state and consume v3
    assert(TableLog.headVersion(v) == 3,
      "the cursor was lost crossing the empty view state")
    assert(viewAt(v, 3) == recompute(t, 3))
  }

  test("bootstrap starts from the oldest RETAINED source version, not the literal 1") {
    val t = tmp(); val v = tmp()
    TableLog.overwrite(rows("a" -> 1L), t)             // v1
    TableLog.append(rows("b" -> 2L), t)                // v2
    TableLog.vacuum(t, keepFromVersion = 2)            // v1 is gone
    tick(t, v) // must bootstrap from v2, not fail on the vacuumed v1
    assert(viewAt(v, 1) == recompute(t, 2))
    TableLog.append(rows("c" -> 5L), t)                // v3
    tick(t, v)
    assert(viewAt(v, 2) == recompute(t, 3))
  }

  test("catch-up: a multi-version backlog converges in ONE tick") {
    val t = tmp(); val v = tmp()
    TableLog.overwrite(rows("a" -> 10L, "b" -> 7L), t)  // v1
    TableLog.append(rows("a" -> 1L), t)                 // v2
    TableLog.append(rows("c" -> 100L), t)               // v3
    TableLog.compact(spark, t)                          // v4 (empty feed inside the span)
    TableLog.append(rows("b" -> 2L, "d" -> 9L), t)      // v5
    tickAll(t, v) // bootstrap (__v=1) + ONE folded step (__v=5)
    assert(TableLog.headVersion(v) == 2,
      s"a 4-version backlog must converge in one tick, not ${TableLog.headVersion(v)} commits")
    assert(viewAt(v, 2) == recompute(t, 5))
    assert(TableLog.read(spark, v).agg(max("__v")).head().getInt(0) == 5,
      "the folded commit must advance the cursor to the source head")
    tickAll(t, v) // no new source version — must not commit
    assert(TableLog.headVersion(v) == 2)
  }

  test("catch-up: a span that lands an EMPTY state falls back to single-step (cursor recovery invariant)") {
    val t = tmp(); val v = tmp()
    TableLog.overwrite(rows("a" -> 10L), t) // v1
    tickAll(t, v)                           // bootstrap, cursor = 1
    TableLog.overwrite(rows(), t)           // v2: table emptied
    TableLog.overwrite(rows(), t)           // v3: still empty
    tickAll(t, v) // span 1→3 would land empty — must commit single-step (cursor 2)
    assert(TableLog.read(spark, v).count() == 0)
    TableLog.overwrite(rows("c" -> 3L), t)  // v4: rows return
    tickAll(t, v) // cursor recovered as 2 (+1 per empty commit), folds 2→4
    tickAll(t, v) // idempotence guard: at most one more step needed
    assert(viewAt(v, TableLog.headVersion(v)) == recompute(t, 4),
      "the view drifted after catching up across an emptied span")
  }

  test("a NULL group key maintains like any other group (null-safe merge)") {
    import spark.implicits._
    import StreamOps.{IvmCount, IvmSum}
    val t = tmp(); val v = tmp()
    def rowsN(xs: (String, Long)*) = xs.toDF("cat", "us")
    def tickN(): Unit = StreamOps.maintainView(t, v, Seq("cat"),
      Seq(IvmCount("cnt"), IvmSum("us", "sum_us")), maxVersionsPerTick = 1)(
      spark.range(1).toDF(), 0L)
    def stateAt(k: Int) = TableLog.read(spark, v, Some(k))
      .collect().map(r => Option(r.getAs[String]("cat")) ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("sum_us"))).toMap
    TableLog.overwrite(rowsN(("a", 10L), (null, 5L), (null, 2L)), t) // v1
    tickN() // bootstrap: the NULL group is a group like any other
    assert(stateAt(1) == Map(Some("a") -> (1L, 10L), None -> (2L, 7L)))
    // a delta touching the NULL group must MERGE into it, not emit a
    // phantom second NULL row next to the stale one (the EqualTo-join bug)
    TableLog.append(rowsN((null, 100L)), t) // v2
    tickN()
    assert(stateAt(2) == Map(Some("a") -> (1L, 10L), None -> (3L, 107L)),
      s"NULL group drifted: ${stateAt(2)}")
    assert(TableLog.read(spark, v).filter(col("cat").isNull).count() == 1,
      "the NULL group must stay ONE row across merges")
    // and a delete-only delta retracts from it
    TableLog.overwrite(rowsN(("a", 10L)), t) // v3: all NULL rows gone
    tickN()
    assert(stateAt(3) == Map(Some("a") -> (1L, 10L)),
      s"retracted NULL group survived: ${stateAt(3)}")
  }

  test("IvmMin/IvmMax: inserts tighten in place, only a retracted extremum rescans its group") {
    import spark.implicits._
    import StreamOps.{IvmCount, IvmMax, IvmMin}
    val t = tmp(); val v = tmp()
    def rowsV(xs: (String, Long)*) = xs.toDF("cat", "us")
    def tickV(): Unit = StreamOps.maintainView(t, v, Seq("cat"),
      Seq(IvmCount("cnt"), IvmMin("us", "min_us"), IvmMax("us", "max_us")),
      maxVersionsPerTick = 1)(spark.range(1).toDF(), 0L)
    def stateHead() = TableLog.read(spark, v)
      .collect().map(r => r.getAs[String]("cat") ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("min_us"), r.getAs[Long]("max_us"))).toMap
    def recomputeV(k: Int) = TableLog.read(spark, t, Some(k))
      .groupBy("cat").agg(count(lit(1)), min("us"), max("us"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def rescans = StreamOps.rescanCount(v)
    TableLog.overwrite(rowsV(("a", 10L), ("a", 5L), ("b", 7L)), t) // v1
    tickV() // bootstrap
    assert(stateHead() == recomputeV(1))
    // INSERT-only delta: extrema tighten in the fold, NO rescan
    val r0 = rescans
    TableLog.append(rowsV(("a", 1L), ("a", 20L), ("c", 3L)), t) // v2
    tickV()
    assert(stateHead() == recomputeV(2))
    assert(stateHead()("a") == ((4L, 1L, 20L)))
    assert(rescans == r0, "an insert-only delta must not rescan")
    // NON-extremum delete: a's 5 and 10 go (1 and 20 stay) — still no rescan
    TableLog.overwrite(rowsV(("a", 1L), ("a", 20L), ("b", 7L), ("c", 3L)), t) // v3
    tickV()
    assert(stateHead() == recomputeV(3))
    assert(rescans == r0, "deleting non-extremum rows must not rescan")
    // EXTREMUM retraction: a loses its min (1) — exactly one rescan tick,
    // and the rescanned group lands on the true new extremum
    TableLog.overwrite(rowsV(("a", 20L), ("b", 7L), ("c", 3L)), t) // v4
    tickV()
    assert(stateHead() == recomputeV(4))
    assert(stateHead()("a") == ((1L, 20L, 20L)))
    assert(rescans == r0 + 1, "a retracted extremum must rescan (once)")
    // group drop: c vanishes entirely — dropped by liveness, no rescan for it
    TableLog.overwrite(rowsV(("a", 20L), ("b", 7L)), t) // v5
    tickV()
    assert(stateHead() == recomputeV(5))
    assert(stateHead().keySet == Set("a", "b"))
    // catch-up parity: a fresh view folds the whole v1–v5 history in one
    // tick (retractions inside the span included) and matches the head
    val v2dir = tmp()
    StreamOps.maintainView(t, v2dir, Seq("cat"),
      Seq(IvmCount("cnt"), IvmMin("us", "min_us"), IvmMax("us", "max_us")))(
      spark.range(1).toDF(), 0L)
    val catchup = TableLog.read(spark, v2dir)
      .collect().map(r => r.getAs[String]("cat") ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("min_us"), r.getAs[Long]("max_us"))).toMap
    assert(catchup == recomputeV(5), "catch-up fold drifted from recompute")
  }

  test("IvmSum rejects non-integral value columns (exact-micros discipline enforced, not just documented)") {
    import spark.implicits._
    import StreamOps.{IvmCount, IvmSum}
    val t = tmp(); val v = tmp()
    TableLog.overwrite(Seq(("a", 1.5), ("b", 2.5)).toDF("cat", "val"), t)
    val e = intercept[IllegalArgumentException] {
      StreamOps.maintainView(t, v, Seq("cat"),
        Seq(IvmCount("cnt"), IvmSum("val", "s")))(spark.range(1).toDF(), 0L)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    assert(TableLog.headVersion(v) == 0, "the rejected bootstrap must not commit")
  }

  test("a vacuumed view history fails with the rebuild diagnostic, not a raw manifest error") {
    val t = tmp(); val v = tmp()
    TableLog.overwrite(rows("a" -> 1L), t)  // v1
    tick(t, v)                              // view v1 (non-empty, __v=1)
    TableLog.overwrite(rows(), t)           // v2: table emptied
    tick(t, v)                              // view v2 (empty)
    TableLog.overwrite(rows(), t)           // v3: still empty
    tick(t, v)                              // view v3 (empty)
    TableLog.vacuum(v, keepFromVersion = 2) // the only non-empty view version is gone
    TableLog.append(rows("c" -> 5L), t)     // v4
    val e = intercept[IllegalStateException] { tick(t, v) }
    assert(e.getMessage.contains("rebuild the view"),
      s"expected the dedicated vacuumed-cursor diagnostic, got: ${e.getMessage}")
  }

  test("a non-positive span is rejected (it would commit duplicate versions forever)") {
    val t = tmp(); val v = tmp()
    TableLog.overwrite(rows("a" -> 1L), t)
    val e = intercept[IllegalArgumentException] {
      StreamOps.changeFeedIvm(t, v, maxVersionsPerTick = 0)(spark.range(1).toDF(), 0L)
    }
    assert(e.getMessage.contains("maxVersionsPerTick"), e.getMessage)
  }

  test("a tick past the head is a no-op (restart/idempotence)") {
    val t = tmp(); val v = tmp()
    TableLog.overwrite(rows("a" -> 1L), t)
    tick(t, v)
    val head = TableLog.headVersion(v)
    tick(t, v) // no new source version — must not commit
    tick(t, v)
    assert(TableLog.headVersion(v) == head,
      "a tick with no new source version must leave the view untouched")
    assert(viewAt(v, head) == recompute(t, 1))
  }
}
