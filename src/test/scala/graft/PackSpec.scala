package graft

import graft.text.Pack
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity gate for Pack.groupedCumSum — the dual-regime prefix sum behind
  * pack_sequences. The oracle query gates the small regime end-to-end; this
  * spec gates regime EQUALITY on adversarial shapes: one dominant source
  * (the 100 TB crawl case), a one-doc source, empty-ish token counts, and
  * bucket-boundary doc_ids.
  */
class PackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("distributed cumsum is row-identical to the per-source window") {
    import spark.implicits._
    // source "crawl" holds ~95% of docs (the dominant-source skew the
    // distributed regime exists for); doc_ids non-contiguous
    val rows = (0 until 5000).map { i =>
      val src = if (i % 20 != 0) "crawl" else s"s${i % 3}"
      (src, i.toLong * 7 + (i % 5), (graft.functions.Hashing.md5Mod(s"tk|$i", 50L) + 1))
    } :+ (("lone", 999999L, 3L))
    val df = rows.toDF("source", "doc_id", "tk")
    val mn = rows.map(_._2).min; val mx = rows.map(_._2).max
    val bucket = least(greatest(
      floor((col("doc_id").cast("double") - mn) / (mx - mn).toDouble * 65535)
        .cast("int"), lit(0)), lit(65535))
    val big = Pack.groupedCumSum(df, Seq("source"), "doc_id", "tk", "cum",
        bucket, distributed = true)
      .select(col("source"), col("doc_id"), col("cum"))
    val small = Pack.groupedCumSum(df, Seq("source"), "doc_id", "tk", "cum",
        bucket, distributed = false)
      .select(col("source"), col("doc_id"), col("cum").as("cum_s"))
    val joined = big.join(small, Seq("source", "doc_id"))
    assert(joined.filter(col("cum") =!= col("cum_s")).count() == 0)
    assert(big.count() == rows.length.toLong)
  }

  test("many-source corpora keep the bucket machinery (a skewed source must still split)") {
    import spark.implicits._
    // 5000 distinct sources over the row knob, with ONE source holding most
    // of the rows — the realistic crawl shape. The old ≥4096-source guard
    // disabled bucketing entirely here, making the dominant source's cumsum
    // a single-task sort at any scale; the bucket count scales down instead
    // (max(8, 65536/5000) = 13 → 65k offset rows, still broadcastable).
    val rows = (0 until 4999).map(i => (s"src$i", i.toLong, 10L)) ++
      (0 until 2000).map(i => ("srcBig", 10000L + i, 10L))
    val df = rows.toDF("source", "doc_id", "tk")
      .withColumn("text", concat_ws(" ", lit("a"), lit("b")))
      .drop("tk")
    spark.conf.set("graft.rank.smallMaxRows", "0")
    try {
      val out = Pack.packWindows(df, contextLen = 8)
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("__b_cum"),
        "many-source corpus must STILL bucket — source count is no skew guarantee")
      assert(p.contains("BroadcastHashJoin"),
        "65k offset rows should ride back broadcast")
      // parity against the plain window on the same data
      spark.conf.unset("graft.rank.smallMaxRows")
      val small = Pack.packWindows(df, contextLen = 8)
        .orderBy("source", "window_id").collect().toSeq
      spark.conf.set("graft.rank.smallMaxRows", "0")
      assert(out.orderBy("source", "window_id").collect().toSeq == small)
    } finally spark.conf.unset("graft.rank.smallMaxRows")
  }

  test("huge source counts drop the offsets broadcast but keep the keyed join") {
    import spark.implicits._
    // 40k sources × floor-8 buckets = 320k potential offset rows > the 256k
    // broadcast bound: the offsets join must become a plain keyed join (no
    // driver-side collect of an unbounded frame), results unchanged.
    val df = (0 until 40960).map(i => (s"s$i", i.toLong, 1L))
      .toDF("source", "doc_id", "tk")
      .withColumn("text", lit("a"))
      .drop("tk")
    spark.conf.set("graft.rank.smallMaxRows", "0")
    try {
      val out = Pack.packWindows(df, contextLen = 8)
      val opt = out.queryExecution.optimizedPlan.toString
      assert(opt.contains("__b_cum"), "big regime should bucket")
      // the FORCED broadcast hint must be gone above the 256k bound — AQE
      // may still pick a broadcast when the offsets frame is small at
      // runtime (fine: that's a measured decision, not an unbounded hint)
      assert(!opt.contains("strategy=broadcast"),
        "≥256k potential offset rows must not carry a forced broadcast hint")
    } finally spark.conf.unset("graft.rank.smallMaxRows")
  }

  test("few-source big regime scales the bucket count down (offsets ≤ ~65536 rows)") {
    import spark.implicits._
    // 128 sources above the knob: buckets = 65536/128 = 512 per source, so
    // the offsets frame stays ≤ 65536 rows; parity with the plain window
    val rows = (0 until 4000).map(i => (s"s${i % 128}", i.toLong, (i % 7 + 1).toLong))
    val df = rows.toDF("source", "doc_id", "tk")
      .withColumn("text", concat_ws(" ", (0 until 3).map(_ => lit("w")): _*))
    val docs = df.select(col("source"), col("doc_id"), col("text"))
    def run() = Pack.packWindows(docs, contextLen = 8)
      .orderBy("source", "window_id").collect().toSeq
    val small = run()
    spark.conf.set("graft.rank.smallMaxRows", "0")
    try {
      val big = Pack.packWindows(docs, contextLen = 8)
      val p = big.queryExecution.executedPlan.toString
      assert(p.contains("__b_cum"), "128-source big regime should still bucket")
      assert(run() == small && small.nonEmpty)
    } finally spark.conf.unset("graft.rank.smallMaxRows")
  }

  test("packWindows is regime-invariant on the documents fixture") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    def run() = Pack.packWindows(docs)
      .orderBy("source", "window_id").collect().toSeq
    val small = run()
    spark.conf.set("graft.rank.smallMaxRows", "0")
    try {
      val bigRes = run()
      assert(bigRes == small && small.nonEmpty)
    } finally spark.conf.unset("graft.rank.smallMaxRows")
  }
}
