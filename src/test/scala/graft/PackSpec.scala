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

  test("many-source corpora skip the bucket machinery (offsets broadcast stays tiny)") {
    import spark.implicits._
    // 5000 distinct sources over the row knob: the per-source window already
    // has 5000-way parallelism, and |sources|×65536 bucket offsets would be
    // a ~330M-row broadcast — the guard must choose the plain window
    val df = (0 until 5000).map(i => (s"src$i", i.toLong, 10L))
      .toDF("source", "doc_id", "tk")
      .withColumn("text", concat_ws(" ", lit("a"), lit("b")))
      .drop("tk")
    spark.conf.set("graft.rank.smallMaxRows", "0")
    try {
      val p = Pack.packWindows(df).queryExecution.executedPlan.toString
      assert(!p.contains("__b_cum"),
        "≥4096-source corpus must use the plain per-source window, not bucket offsets")
      assert(!p.contains("BroadcastHashJoin"), "no offsets broadcast expected")
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
