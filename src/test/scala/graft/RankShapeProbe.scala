package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B for the PPJoin ranked-prefix construction: doc-frequency via
  * groupBy+join (two exchanges on shingle) vs a count() window over the
  * shingle partition (one exchange), both followed by the per-doc rank
  * window. Run: `Test/runMain graft.RankShapeProbe`.
  *
  * VERDICT (r10, sf0.1): window-df is ~0.15–0.4 s faster at fixture scale
  * (0.66 vs 0.79 s warm) — and rejected. The window shuffles EVERY shingle
  * row to its shingle's partition with no partial aggregation, so a hot
  * shingle at corpus scale becomes a single-partition straggler AQE cannot
  * split; groupBy+join partial-aggregates df map-side (measured ~12% of
  * wall at the 1M-doc probe, DESIGN.md) and the subsequent join is
  * AQE-skew-splittable. Dedup.jaccardPairs keeps groupBy+join.
  */
object RankShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    val sh = graft.text.Dedup.shingles(docs, 3)
      .join(docs.select(col("doc_id")), "doc_id") // force a non-cached frame
      .cache()
    sh.count()
    val threshold = 0.4
    val szW = Window.partitionBy("doc_id")
    val withSz = sh.withColumn("sz", count(lit(1)).over(szW))
    def prefLen = floor(lit(1.0 - threshold) * col("sz") + lit(1e-9)).cast("long") + lit(1L)
    def timed(tag: String)(f: => Long): Unit =
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime(); val c = f
        println(f"$tag%-16s pass$p ${(System.nanoTime() - t0) / 1e9}%6.2f s ($c rows)")
      }
    timed("groupBy+join") {
      val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      withSz.join(dfreq, "shingle")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))))
        .filter(col("rk") <= prefLen && col("df") > 1)
        .count()
    }
    timed("window-df") {
      withSz.withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))))
        .filter(col("rk") <= prefLen && col("df") > 1)
        .count()
    }
    spark.stop()
  }
}
