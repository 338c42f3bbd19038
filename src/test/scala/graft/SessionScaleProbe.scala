package graft

import graft.events.EventOps
import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthetic-scale A/B for the r14 skew-safe sessionizer and the sampled
  * skew census, at shapes the fixture cannot reach. Run:
  * `Test/runMain graft.SessionScaleProbe [nEvents]` (default 5,000,000).
  *
  * - sessions: `sessionStats` (one window task per user) vs
  *   `sessionStatsBucketed` at nEvents rows with 90% of the events on ONE
  *   user — the same one-task-per-hot-key exposure the bucketed as-of
  *   closed, now on session assembly. Equality of the two results is
  *   asserted inside the probe (the parity spec covers small shapes; this
  *   re-checks at 5M).
  * - census: `heavyKeys` (full |distinct keys| shuffle) vs
  *   `heavyKeysSampled` at nEvents rows over ~0.6·nEvents distinct keys —
  *   the cardinality regime the sampled form exists for; both must agree
  *   on the heavy set.
  *
  * VERDICT (r14, 32 cores, n = 5M): see DESIGN.md "Round-14" — the plain
  * sessionizer's hot task sorts the hot user's 4.5M-row history alone
  * while the bucketed path splits it over 64 slices.
  */
object SessionScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    def hashT(seed: String, m: Long) =
      conv(substring(md5(concat(lit(seed), col("id"))), 1, 12), 16, 10)
        .cast("long") % m

    // ---- hot-user sessions ----------------------------------------------
    // 90% of events on user 0; timestamps over ~one year of nanos so the
    // 1800 s gap yields real multi-event sessions. ts_ns µs-grained like
    // the fixture.
    val yearUs = 365L * 86400L * 1000000L
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      (hashT("ts", yearUs) * 1000L).as("ts_ns"),
      when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 97L)
        .as("user_id"),
      lit("click").as("event_type"),
      (col("id") % 1000L).cast("double").as("value"),
      lit("{}").as("props")).cache()
    println(s"sessions: ${ev.count()} events, 90% on one user")
    val gap = 1800
    val bucketSec = (yearUs / 1000000L / 64L) + 1L // 64 time slices
    var plainCnt = 0L; var bktCnt = 0L
    (1 to 3).foreach { p =>
      time(s"sessions plain hot p$p") {
        plainCnt = EventOps.sessionStats(ev, gap)
          .agg(count(lit(1)), sum("n_events"), sum("sum_value_micros"))
          .collect()(0).getLong(0)
      }
      time(s"sessions bucketed hot p$p") {
        bktCnt = EventOps.sessionStatsBucketed(ev, gap, bucketSec)
          .agg(count(lit(1)), sum("n_events"), sum("sum_value_micros"))
          .collect()(0).getLong(0)
      }
    }
    require(plainCnt == bktCnt, s"parity broke at scale: $plainCnt vs $bktCnt")
    println(s"sessions parity at n=$n: $plainCnt sessions both paths")

    // ---- sampled census at extreme key cardinality -----------------------
    // ~40% of rows on two hot keys, the rest on unique keys: |distinct| ≈
    // 0.6·n, the regime where the full census shuffle is the problem.
    val fact = spark.range(n).select(col("id").as("rid"),
      when(col("id") % 10 < 3, lit("whale"))
        .when(col("id") % 10 < 4, lit("shark"))
        .otherwise(concat(lit("u"), col("id"))).as("k")).cache()
    println(s"census: ${fact.count()} rows, ~${(0.6 * n).toLong} distinct keys")
    var exact: Set[String] = Set.empty; var sampled: Set[String] = Set.empty
    (1 to 3).foreach { p =>
      time(s"census exact p$p") {
        exact = SkewJoin.heavyKeys(fact, "k", heavyThreshold = n / 20)
          .map(_.toString).toSet
      }
      time(s"census sampled p$p") {
        sampled = SkewJoin.heavyKeysSampled(fact, "k", col("rid"),
          minShare = 0.05, sampleRate = 0.002).map(_.toString).toSet
      }
    }
    require(exact == Set("whale", "shark"), s"exact census broke: $exact")
    require(sampled == exact, s"sampled census diverged: $sampled vs $exact")
    println(s"census agreement at n=$n: $exact")
    spark.stop()
  }
}
