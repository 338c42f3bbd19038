package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis: cost of each streaming leg ALONE vs the trio — where
  * does the per-trigger floor go? (scratch probe, not part of the suite)
  */
object StreamLegProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.events.EventOps
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"LEG $tag%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    // warm the replay dir + session
    graft.streaming.StreamOps.multiBatchDir(spark, dir)
    spark.range(100000L).selectExpr("sum(id)").collect()

    (1 to 3).foreach { pass =>
      println(s"--- pass $pass")
      time("tumbling") {
        val q = graft.streaming.StreamOps.eventsStreamBatched(spark, dir)
          .withWatermark("event_time", "30 minutes")
          .groupBy(window(col("event_time"), "600 seconds"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(s"lt_${pass}")
          .outputMode("complete").start()
        q.processAllAvailable(); q.stop()
      }
      time("tumb-1trig") {
        val replay = graft.streaming.StreamOps.multiBatchDir(spark, dir)
        val one = spark.readStream.schema(graft.streaming.StreamOps.eventsSchema(spark, replay))
          .option("pathGlobFilter", "*.parquet").parquet(replay)
        val dec = graft.Tables.normalizeTs(one)
          .withColumn("event_time", timestamp_micros((col("ts_ns").cast("decimal(38,0)") / 1000).cast("long")))
        val q = dec.withWatermark("event_time", "30 minutes")
          .groupBy(window(col("event_time"), "600 seconds"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(s"l1_${pass}")
          .outputMode("complete").start()
        q.processAllAvailable(); q.stop()
      }
      time("dedup") {
        val q = graft.streaming.StreamOps.eventsStreamBatched(spark, dir)
          .withColumn("__dup", explode(array(lit(0), lit(1)))).drop("__dup")
          .withWatermark("event_time", "30 minutes")
          .dropDuplicatesWithinWatermark("event_id")
          .select(col("event_id"), col("user_id"))
          .writeStream.format("memory").queryName(s"ld_${pass}")
          .outputMode("append").start()
        q.processAllAvailable(); q.stop()
      }
      time("sessions") {
        import spark.implicits._
        val ev = graft.streaming.StreamOps.eventsStreamBatched(spark, dir)
          .select(col("user_id"), EventOps.epochSecNs(col("ts_ns")).as("es"), col("value"))
          .as[graft.streaming.StreamOps.Ev]
        val q = graft.streaming.StreamOps
          .sessionizeStream(ev, gapSec = 1800, lateness = "1800500 milliseconds")
          .writeStream.format("memory").queryName(s"ls_${pass}")
          .outputMode("append").start()
        q.processAllAvailable(); q.stop()
      }
    }
    spark.stop()
  }
}
