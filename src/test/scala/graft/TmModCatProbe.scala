package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: dump the per-matched-row TabularMark categories under the
  * modification-grid attack so the DuckDB replay can be diffed row-by-row
  * (sf0.1 showed a 1-row ng divergence; sf0.001/sf0.01 are exact).
  * Run: `Test/runMain graft.TmModCatProbe [sfDir] [outDir]`.
  */
object TmModCatProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/tmmod_cats")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.dumpTmModCats(spark, dir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    println(s"[probe] wrote $out")
    spark.stop()
  }
}
