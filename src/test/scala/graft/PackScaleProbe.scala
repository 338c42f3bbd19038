package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the pack_sequences prefix sum at the shape the dual regime exists
  * for: N rows in ONE dominant source (a web crawl is typically one source),
  * where a source-partitioned window is a single-task global sort. Compares
  * the plain per-source window against the bucketed cumsum
  * (Pack.groupedCumSum distributed regime) on a synthetic one-source frame,
  * and checks row-identical window assignment. Run:
  * `Test/runMain graft.PackScaleProbe [nRows]` (default 5,000,000).
  *
  * VERDICT (r11, 1 source / 32 cores): at 5M rows plain window 2.8–4.1 s
  * (the whole sort + cumsum in ONE task, 31 cores idle) vs bucketed
  * 1.5–3.3 s (~1.8× warm); at 20M rows 10.4–16.9 s vs 6.4–9.3 s — the
  * plain path grows linearly on one core while the bucketed path fans the
  * sort over (source × 65536-range-bucket) partitions, so the gap widens
  * with corpus size and is unbounded at 100 TB. Parity: 0 differing rows
  * at both probe scales.
  */
object PackScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one dominant source, deterministic token counts 1..400
    val df = spark.range(n).select(
      lit("crawl").as("source"), col("id").as("doc_id"),
      (pmod(col("id") * 2654435761L, lit(400)) + 1).as("tk")).cache()
    df.count()
    val mx = n - 1
    val bucket = least(greatest(
      floor(col("doc_id").cast("double") / mx.toDouble * 65535).cast("int"),
      lit(0)), lit(65535))
    def report(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        val c = f.groupBy("source").agg(max("cum"), count(lit(1))).collect()
        println(f"$tag%-14s pass$p ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
          s"(${c.map(_.getLong(2)).sum} rows)")
      }
    report("plain-window") {
      graft.text.Pack.groupedCumSum(df, Seq("source"), "doc_id", "tk", "cum",
        bucket, distributed = false)
    }
    report("bucketed") {
      graft.text.Pack.groupedCumSum(df, Seq("source"), "doc_id", "tk", "cum",
        bucket, distributed = true)
    }
    // parity at probe scale (not just the fixture-sized PackSpec)
    val a = graft.text.Pack.groupedCumSum(df, Seq("source"), "doc_id", "tk",
      "cum", bucket, distributed = false).select("doc_id", "cum")
    val b = graft.text.Pack.groupedCumSum(df, Seq("source"), "doc_id", "tk",
      "cum", bucket, distributed = true)
      .select(col("doc_id"), col("cum").as("cum_b"))
    val diff = a.join(b, "doc_id").filter(col("cum") =!= col("cum_b")).count()
    println(s"parity diff rows: $diff (expect 0)")
    spark.stop()
  }
}
