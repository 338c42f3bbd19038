package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming counterparts of graft.events.EventOps: the same
  * event-time aggregations expressed as unbounded streams — `readStream` →
  * watermarked windowed aggregates, plus a flatMapGroupsWithState
  * sessionizer. The reference has no streaming at all (SURVEY §2.10); these
  * exist for the engine's pipeline north star. Batch/stream parity is tested
  * by replaying the events fixture through the memory sink and comparing to
  * the batch operator.
  */
object StreamOps {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType), // nanos
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-stream over the events fixture (one file = one micro-batch replay). */
  def eventsStream(spark: SparkSession, dir: String,
                   glob: String = "events.parquet"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("event_time", timestamp_micros((col("ts_ns").cast("decimal(38,0)") / 1000).cast("long")))
  }

  /** Watermarked tumbling-window counts; late data beyond `lateness` dropped. */
  def tumblingCounts(stream: DataFrame, widthSec: Int, lateness: String = "30 minutes"): DataFrame =
    stream
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), s"$widthSec seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        (unix_timestamp(col("window.start")) / widthSec).cast("long").as("bucket"),
        col("event_type"), col("n"), col("sum_value"))

  final case class Ev(user_id: Long, es: Long, value: Double)
  final case class EvT(user_id: Long, es: Long, value: Double,
                       event_time: java.sql.Timestamp)
  final case class SessState(start: Long, last: Long, n: Long, sumMicros: Long)
  final case class SessionOut(user_id: Long, start_es: Long, end_es: Long,
                              n_events: Long, sum_value_micros: Long)

  /** Custom stateful operator: gap-based sessionization via
    * flatMapGroupsWithState with EVENT-TIME TIMEOUT. A session closes when a
    * later event arrives more than `gapSec` after the last one, OR when the
    * event-time watermark passes last + gap — so the final session of every
    * user is emitted once the stream's watermark moves on, without needing a
    * per-user sentinel event. Values accumulate as exact integer micros —
    * associative, and identical to the batch operator / DuckDB oracle
    * bit-for-bit (a double running sum would be arrival-order-sensitive).
    *
    * The watermark clock is rebuilt from `es` (whole seconds), so the flush
    * condition is exactly (last + gapSec)·1000 < max(es)·1000 − latenessMs —
    * SQL-predictable. Pass a lateness with a non-integer-second millisecond
    * part (e.g. "1800500 milliseconds") to make that comparison tie-free,
    * independent of whether the timeout check is strict.
    *
    * In batch execution there is no watermark (state dies with the single
    * batch anyway); the timeout registration is skipped.
    */
  def sessionizeStream(events: Dataset[Ev], gapSec: Long,
                       lateness: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timed = events
      .withColumn("event_time", timestamp_seconds(col("es")))
      .withWatermark("event_time", lateness)
      .as[EvT]
    timed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[EvT], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is final — flush
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.start, st.last, st.n, st.sumMicros))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.es, e.value))
            val out    = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var st     = state.getOption.orNull
            sorted.foreach { e =>
              val m = math.floor(e.value * 1000000.0 + 0.5).toLong
              if (st == null) st = SessState(e.es, e.es, 0, 0L)
              if (e.es - st.last > gapSec) {
                out += SessionOut(user, st.start, st.last, st.n, st.sumMicros)
                st = SessState(e.es, e.es, 1, m)
              } else {
                st = SessState(st.start, e.es, st.n + 1, st.sumMicros + m)
              }
            }
            if (st != null) {
              state.update(st)
              try {
                // never set a timestamp at/below the current watermark —
                // max(…, wm + 1) keeps the registration legal; such a
                // session flushes on the next watermark advance
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(math.max((st.last + gapSec) * 1000L, wm + 1L))
              } catch { case _: UnsupportedOperationException => () } // batch: no watermark
            }
            out.iterator
          }
      }
  }
}
