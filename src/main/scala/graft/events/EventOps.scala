package graft.events

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Event-stream batch operators over the `events` fixture
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Time is normalized to epoch SECONDS (bigint) at the operator boundary —
  * timestamp rendering differs across engines, epoch integers never do.
  * The streaming (readStream) counterparts live in graft.streaming.
  */
object EventOps {

  /** Epoch seconds; NTZ/LTZ-agnostic under a UTC session. */
  def epochSec(ts: Column): Column = ts.cast("timestamp").cast("long")

  /** Exact microseconds from the fixture's nanosecond longs. Via decimal —
    * a direct double cast of int64 nanos loses precision above 2^53 (≈256 ns
    * error, enough to cross a bucket boundary). Truncation toward zero
    * mirrors DuckDB's ns→µs timestamp cast.
    */
  def microsNs(tsNs: Column): Column =
    (tsNs.cast("decimal(38,0)") / lit(1000)).cast("long")

  /** Epoch seconds = floor(µs / 1e6) in double — the exact expression
    * DuckDB's `epoch(ts)` evaluates, so both engines bucket identically
    * (µs ≤ 2^53, the double is exact).
    */
  def epochSecNs(tsNs: Column): Column =
    floor(microsNs(tsNs).cast("double") / lit(1000000.0)).cast("long")

  /** Exact integer micro-units of a double measure: floor(x·1e6 + 0.5) —
    * round-half-up in pure IEEE double arithmetic, bit-identical in every
    * engine (unlike decimal sums, whose stringification differs between
    * readers, or round(), whose tie-breaking is engine-specific). Summing
    * the resulting bigints is exact and associative — partial aggregation
    * distributes with no ordering concerns.
    */
  def micros(c: Column): Column = floor(c.cast("double") * lit(1000000.0) + lit(0.5))

  /** Tumbling-window aggregate: bucket = floor(epoch / width). */
  def tumbling(df: DataFrame, widthSec: Int): DataFrame =
    df.groupBy(
        floor(epochSecNs(col("ts_ns")) / widthSec).cast("long").as("bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(micros(col("value"))).as("sum_value_micros"))
      .withColumn("bucket_start", col("bucket") * widthSec)

  /** Sliding event-time windows via Spark's NATIVE window() expansion (each
    * event is replicated into width/slide overlapping windows by the
    * optimizer's Expand node — the genuinely-sliding shape tumbling can't
    * express). Output keyed by window-start slot; slot boundaries are
    * integer-aligned so the µs-precise assignment agrees with the oracle's
    * floor(epoch)-based replay.
    */
  def sliding(df: DataFrame, widthSec: Int, slideSec: Int): DataFrame =
    df.withColumn("event_time",
        timestamp_micros((col("ts_ns").cast("decimal(38,0)") / 1000).cast("long")))
      .groupBy(window(col("event_time"), s"$widthSec seconds", s"$slideSec seconds"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(micros(col("value"))).as("sum_value_micros"))
      .select(
        (unix_timestamp(col("window.start")) / slideSec).cast("long").as("slot"),
        col("event_type"), col("n"), col("sum_value_micros"),
        unix_timestamp(col("window.start")).cast("long").as("window_start"))

  /** Gap-based sessionization: a session breaks after `gapSec` of user
    * inactivity. Adds (session_seq) per user via the classic
    * lag + running-sum-of-boundaries window pair.
    */
  def sessionize(df: DataFrame, gapSec: Int): DataFrame = {
    val w  = Window.partitionBy(col("user_id")).orderBy(microsNs(col("ts_ns")), col("event_id"))
    val es = epochSecNs(col("ts_ns"))
    df.withColumn("prev_es", lag(es, 1).over(w))
      .withColumn("new_session",
        when(col("prev_es").isNull || (es - col("prev_es")) > gapSec, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("prev_es", "new_session")
  }

  /** Per-session stats: events, span, value sum. */
  def sessionStats(df: DataFrame, gapSec: Int): DataFrame =
    sessionize(df, gapSec)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(epochSecNs(col("ts_ns"))).as("start_es"),
        max(epochSecNs(col("ts_ns"))).as("end_es"),
        sum(micros(col("value"))).as("sum_value_micros"))
      .withColumn("duration_sec", col("end_es") - col("start_es"))

  /** Skew-safe sessionizer: row-identical to `sessionStats`, but the big
    * event-level window partitions by `(user_id, es div bucketSec)` instead
    * of the user alone — `sessionize`'s partitionBy(user_id) puts a hot
    * user's ENTIRE history on one task, the same failure mode
    * AsOfJoin.backwardBucketed closes for as-of joins, closed here with the
    * same (key, time-slice) + carry construction.
    *
    * Pass 1 sessionizes WITHIN each (user, bucket) slice. Pass 2 stitches
    * across slice boundaries on a bucket-level frame (one row per non-empty
    * (user, bucket) — thousands of rows where the data had billions): a
    * slice's first local session merges with the previous non-empty slice's
    * last session iff the boundary gap `head_es − prev_tail_es ≤ gapSec`,
    * and the per-user running sum of `local_sessions − merged` over STRICTLY
    * EARLIER slices is the slice's global numbering offset — so
    * `session_seq = offset + local_seq − merged` reproduces `sessionize`'s
    * numbering exactly, including sessions chaining across 3+ slices (each
    * merged slice contributes 0 net new sessions). The final per-session
    * aggregate is an ordinary hash groupBy — min/max/count/integer-micros
    * sums are associative, so sessions spanning slices aggregate exactly.
    *
    * Cost: the same single big exchange (now on (user, bucket)), plus a
    * per-user window over the tiny bucket frame and a co-partitioned
    * stitch join. Choose bucketSec so a hot user's rows per slice fit a
    * task; GroupedRankSpec-style parity across widths (including degenerate
    * ones) is pinned by EventSessionBucketedSpec.
    */
  def sessionStatsBucketed(df: DataFrame, gapSec: Int, bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"bucketSec=$bucketSec must be positive")
    val esCol = epochSecNs(col("ts_ns"))
    val base = df.withColumn("__es", esCol)
      .withColumn("__bkt",
        floor(col("__es").cast("decimal(38,0)") / lit(bucketSec)).cast("long"))
    val wIn = Window.partitionBy(col("user_id"), col("__bkt"))
      .orderBy(microsNs(col("ts_ns")), col("event_id"))
    val local = base
      .withColumn("__prev", lag(col("__es"), 1).over(wIn))
      .withColumn("__brk",
        when(col("__prev").isNull || (col("__es") - col("__prev")) > gapSec, 1)
          .otherwise(0))
      .withColumn("__lseq",
        sum(col("__brk")).over(wIn.rowsBetween(Window.unboundedPreceding, 0)))
    val wB = Window.partitionBy("user_id").orderBy("__bkt")
    val stitched = local.groupBy(col("user_id"), col("__bkt"))
      .agg(min(col("__es")).as("__head"), max(col("__es")).as("__tail"),
        max(col("__lseq")).as("__k"))
      .withColumn("__ptail", lag(col("__tail"), 1).over(wB))
      .withColumn("__m",
        when(col("__ptail").isNotNull && (col("__head") - col("__ptail")) <= gapSec, 1L)
          .otherwise(0L))
      .withColumn("__off", coalesce(
        sum(col("__k") - col("__m")).over(wB.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    local.join(stitched.select("user_id", "__bkt", "__m", "__off"),
        Seq("user_id", "__bkt"))
      .withColumn("session_seq", col("__off") + col("__lseq") - col("__m"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__es")).as("start_es"),
        max(col("__es")).as("end_es"),
        sum(micros(col("value"))).as("sum_value_micros"))
      .withColumn("duration_sec", col("end_es") - col("start_es"))
  }
}
