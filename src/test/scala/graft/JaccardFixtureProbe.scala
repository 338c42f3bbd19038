package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for dedup_jaccard_pairs at FIXTURE scale (sf0.1): the
  * 1M-doc JaccardScaleProbe answers the 100× question; this answers where
  * the bench seconds go at 5k docs (scratch probe). MIRRORS the shipped
  * r10 pipeline (inline per-doc sz before the explode — no sizes aggregate
  * or join); if Dedup.jaccardPairs changes shape, update this in step.
  */
object JaccardFixtureProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      GraftCache.clear(); spark.catalog.clearCache()
      val docs = Tables.documents(spark, dir)
      val n = 3; val threshold = 0.4
      import org.apache.spark.sql.expressions.Window
      val words = split(col("text"), " ")
      // the production shingle UDF itself — no inline copy to drift
      val shUdf = graft.text.Dedup.shingleSetUdf(n)
      val sh = time("shingles+sz+persist") {
        val s = graft.GraftCache.track(
          docs.filter(size(words) >= n)
            .withColumn("__shset", shUdf(col("text")))
            .select(col("doc_id"), size(col("__shset")).cast("long").as("sz"),
              explode(col("__shset")).as("shingle")))
        s.count(); s
      }
      val dfreq = time("dfreq")(sh.groupBy("shingle").agg(count(lit(1)).as("df")))
      val prefLen = floor(lit(1.0 - threshold) * col("sz") + lit(1e-9)).cast("long") + lit(1L)
      val pre = time("ranked-prefixes") {
        // two-level rank on the shared rows only — mirrors Dedup.jaccardPairs
        val byDoc = Window.partitionBy("doc_id")
        val p = sh.join(dfreq.filter(col("df") > 1), "shingle")
          .withColumn("rk2", row_number().over(byDoc.orderBy(col("df"), col("shingle"))))
          .withColumn("n_hot", count(lit(1)).over(byDoc))
          .withColumn("rk", col("sz") - col("n_hot") + col("rk2"))
          .filter(col("rk") <= prefLen)
          .select(col("doc_id"), col("shingle"), col("sz"), col("rk")).localCheckpoint()
        p.count(); p
      }
      val suffA = greatest(col("sza") - (floor(lit(1.0 - threshold) * col("sza") + lit(1e-9)).cast("long") + lit(1L)), lit(0L))
      val suffB = greatest(col("szb") - (floor(lit(1.0 - threshold) * col("szb") + lit(1e-9)).cast("long") + lit(1L)), lit(0L))
      val required = lit(threshold / (1.0 + threshold)) * (col("sza") + col("szb")) - lit(1e-9)
      val cand = time("prefix-join+bounds") {
        val c = pre.as("x").join(pre.as("y"),
            col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id") &&
              least(col("x.sz"), col("y.sz")) >=
                lit(threshold) * greatest(col("x.sz"), col("y.sz")) - lit(1e-9))
          .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
            col("x.sz").as("sza"), col("y.sz").as("szb"))
          .agg(count(lit(1)).as("ppcnt"),
            min(least(col("x.rk"), col("y.rk")) +
              least(col("x.sz") - col("x.rk"), col("y.sz") - col("y.rk"))).as("posb"))
          .filter(col("ppcnt") + greatest(suffA, suffB) >= required && col("posb") >= required)
          .select(col("a"), col("b")).localCheckpoint()
        println(s"  candidates: ${c.count()}")
        c
      }
      time("verify-join") {
        graft.text.Dedup.jaccard(cand, sh).filter(col("jaccard") >= threshold).count()
      }
      time("whole-query") {
        SparkEntry.queries("dedup_jaccard_pairs")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
