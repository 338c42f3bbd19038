package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the stream-stream interval join leg: the registered per-user
  * rollup equals the batch interval join computed directly, and — on a
  * synthetic two-file replay — a click arriving in micro-batch 0 still joins
  * a purchase arriving in micro-batch 1 (the cross-batch state retention the
  * operator exists for), while an out-of-window purchase does not.
  */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q_stream_join equals the batch interval join's per-user rollup") {
    val dir = TestSpark.sf0001
    val ev = Tables.events(spark, dir)
    val us = expr("cast(floor(value * 1000000.0 + 0.5) as bigint)")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ns").as("ct"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts_ns").as("pt"), us.as("pv"))
    val want = c.join(p, col("user_id") === col("pu") &&
        col("pt") >= col("ct") &&
        col("pt") < col("ct") + lit(7200L * 1000000000L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"), sum("pv").as("sm_purchase"))
      .orderBy("user_id").collect()
    val got = SparkEntry.queries("q_stream_join")(spark, dir).collect()
    assert(want.nonEmpty, "fixture produced no click→purchase pairs")
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("a pair whose sides arrive in different micro-batches is still joined") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sjoin_").toFile
    try {
      def writeOne(rows: Seq[(Long, String, java.sql.Timestamp)],
                   name: String, mtime: Long): Unit = {
        val raw = new java.io.File(tmp, s"raw_$name")
        rows.toDF("user_id", "kind", "event_time")
          .coalesce(1).write.mode("overwrite").parquet(raw.getAbsolutePath)
        val part = raw.listFiles((f: java.io.File) =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
        val dst = new java.io.File(tmp, s"$name.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(mtime)
        raw.listFiles().foreach(_.delete()); raw.delete()
      }
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      val t0 = System.currentTimeMillis() - 60000L
      // batch 0: clicks for users 1 and 2; batch 1: one purchase inside
      // user 1's window, one purchase way outside user 2's
      writeOne(Seq((1L, "c", ts(0)), (2L, "c", ts(1))), "b0", t0)
      writeOne(Seq((1L, "p", ts(30)), (2L, "p", ts(55))), "b1", t0 + 5000L)

      val schema = Seq((1L, "c", ts(0))).toDF("user_id", "kind", "event_time").schema
      def src() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .option("pathGlobFilter", "*.parquet").parquet(tmp.getAbsolutePath)
      val clicks = src().filter(col("kind") === "c")
        .select(col("user_id"), col("event_time").as("click_time"))
        .withWatermark("click_time", "10 minutes")
      val purchases = src().filter(col("kind") === "p")
        .select(col("user_id").as("pu"), col("event_time").as("p_time"))
        .withWatermark("p_time", "10 minutes")
      val q = clicks.join(purchases,
          col("user_id") === col("pu") &&
            col("p_time") >= col("click_time") &&
            col("p_time") < col("click_time") + expr("INTERVAL 2400 SECONDS"))
        .select(col("user_id"), col("p_time"))
        .writeStream.format("memory").queryName("sjoin_xbatch")
        .outputMode("append").start()
      q.processAllAvailable()
      val lastBatch = q.lastProgress.batchId
      q.stop()
      assert(lastBatch >= 1, s"expected ≥ 2 micro-batches, saw $lastBatch")
      val got = spark.table("sjoin_xbatch").select("user_id")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L),
        s"cross-batch join wrong: $got (user 1's pair spans batches; " +
          "user 2's purchase is outside the 40 min window)")
      spark.catalog.dropTempView("sjoin_xbatch")
    } finally {
      def rm(f: java.io.File): Unit = {
        val k = f.listFiles(); if (k != null) k.foreach(rm); f.delete()
      }
      rm(tmp)
    }
  }
}
