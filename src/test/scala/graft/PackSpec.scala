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
