package graft

import graft.knn.Knn
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LshStreamExtrasSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb   = Tables.embeddings(spark, TestSpark.sf0001).cache()

  test("Knn.lsh returns valid ranked neighbors with useful recall vs exact") {
    val queries = emb.filter(col("vec_id") < 40)
    val exact = Knn.exact(queries, emb, 5).cache()
    val approx = Knn.lsh(queries, emb, 5, bucketLength = 1.0, numHashTables = 5).cache()
    // shape: ranks 1..k, no duplicates per query
    val dup = approx.groupBy("query_id", "neighbor_id").count().filter(col("count") > 1)
    assert(dup.count() == 0)
    assert(approx.filter(col("rank") < 1 || col("rank") > 5).count() == 0)
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    val total = exact.count()
    val recall = hits.toDouble / total
    assert(recall > 0.5, s"LSH recall@5 = $recall")
  }

  test("normalizeTs yields identical nanos for long-nanos and NTZ-micros encodings") {
    import spark.implicits._
    // the same three instants written the two ways the driver's fixture
    // generator has produced them (TIMESTAMP(NANOS)→long via nanosAsLong,
    // and micros TIMESTAMP_NTZ)
    val micros = Seq(0L, 1234567890123456L, 882921600000000L)
    val asLong = micros.map(_ * 1000L).toDF("ts")
    val asNtz  = micros.toDF("us")
      .select(expr("make_timestamp_ntz(1970, 1, 1, 0, 0, 0) + make_dt_interval(0, 0, 0, us / 1e6)").as("ts"))
    assert(asNtz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val expected: Array[Long] = micros.map(_ * 1000L).sorted.toArray
    val a = Tables.normalizeTs(asLong).select("ts_ns").as[Long].collect().sorted
    val b = Tables.normalizeTs(asNtz).select("ts_ns").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq, s"${a.toSeq} != ${b.toSeq}")
    assert(a.toSeq == expected.toSeq)
    // tz-independence: the NTZ wall clock must read as UTC epoch no matter
    // what the session timezone is (incl. a DST-observing zone)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val c = Tables.normalizeTs(asNtz).select("ts_ns").as[Long].collect().sorted
      assert(c.toSeq == expected.toSeq, s"session-tz-dependent: ${c.toSeq}")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("graft_md5mod is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT graft_md5mod('abc', 21L) AS g, graft_md5mod('000000000', 5L) AS h")
      .head()
    assert(got.getLong(0) == 7L && got.getLong(1) == 3L) // BitsSpec goldens
  }

  test("pure-SQL classification via registered functions equals Tvp.classify") {
    import graft.watermark.{Tvp, WmKey}
    GraftExtensions.register(spark)
    val key  = WmKey(seed = "20")
    val dims = key.dims(64)
    emb.createOrReplaceTempView("emb_sql")
    val idDims = dims.init.mkString("array(", ", ", ")")
    val all    = dims.mkString("array(", ", ", ")")
    val sqlRes = spark.sql(
      s"""SELECT vec_id,
         |  graft_content_id(embedding, $idDims, 1000.0D) AS content_id,
         |  cast(graft_md5mod(graft_content_id(embedding, $idDims, 1000.0D), 5L) as int) AS group_id,
         |  graft_extract_lsb(embedding, graft_content_id(embedding, $idDims, 1000.0D), $all) AS hidden_bit
         |FROM emb_sql""".stripMargin)
      .orderBy("vec_id").collect()
    val apiRes = Tvp.classify(emb, 64, 5, key)
      .select("vec_id", "content_id", "group_id", "hidden_bit")
      .orderBy("vec_id").collect()
    assert(sqlRes.length == apiRes.length)
    sqlRes.zip(apiRes).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("sessionize agrees with Spark's native session_window aggregation") {
    import graft.events.EventOps
    val ev = Tables.events(spark, TestSpark.sf0001)
      .withColumn("event_time", timestamp_micros(EventOps.microsNs(col("ts_ns"))))
    val native = ev
      .groupBy(col("user_id"), session_window(col("event_time"), "1800 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select("user_id", "n_events")
      .orderBy("user_id", "n_events").collect()
    val ours = EventOps.sessionStats(Tables.events(spark, TestSpark.sf0001), gapSec = 1800)
      .select("user_id", "n_events")
      .orderBy("user_id", "n_events").collect()
    // session_window closes a session when the NEXT event is >= gap after the
    // last (half-open window); our gap test is strictly >. Equal up to
    // boundary ties, which integer-second fixture gaps make measure-zero —
    // assert full equality and surface any boundary discrepancy loudly.
    assert(native.length == ours.length, s"${native.length} native vs ${ours.length} sessions")
    native.zip(ours).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("streaming watermark drops data later than the lateness bound") {
    import spark.implicits._
    // two batches: in-order events, then a very late straggler
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toString
    // long-nanos `ts` — the shape normalizeTs passes through unchanged (the
    // fixture itself now ships micros timestamps, so this spec doubles as
    // coverage for the legacy-nanos branch)
    val names = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    def write(rows: Seq[(Long, Long, Long, String, Double, String)], f: String): Unit =
      rows.toDF(names: _*).coalesce(1).write.mode("append").parquet(dir)
    val h = 3600L * 1000000000L // one hour in ns
    write(Seq((0L, 10 * h, 1L, "view", 1.0, "{}"), (1L, 11 * h, 1L, "view", 1.0, "{}")), "b1")
    val stream = StreamOps.eventsStream(spark, dir, glob = "*.parquet")
    val q = StreamOps.tumblingCounts(stream, widthSec = 3600, lateness = "30 minutes")
      .writeStream.format("memory").queryName("late_test").outputMode("append").start()
    q.processAllAvailable()
    // straggler 10 hours older than the watermark high-mark: must be dropped
    write(Seq((2L, 1 * h, 1L, "view", 1.0, "{}")), "b2")
    q.processAllAvailable()
    // advance watermark far enough to finalize all open windows; the
    // watermark used in batch N derives from batch N-1's max event time,
    // so one padding batch is needed after the advancing event
    write(Seq((3L, 20 * h, 1L, "view", 1.0, "{}")), "b3")
    q.processAllAvailable()
    write(Seq((4L, 21 * h, 1L, "view", 1.0, "{}")), "b4")
    q.processAllAvailable(); q.stop()
    val buckets = spark.table("late_test").select("bucket").collect().map(_.getLong(0)).sorted
    assert(buckets.contains(10L) && buckets.contains(11L))
    assert(!buckets.contains(1L), s"late event leaked into $buckets")
  }
}
