package graft
import graft.experiments.Experiments
import graft.watermark.{ScpwKey, WmKey}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quality parity at the reference's PUBLISHED N — the one axis the driver
  * fixtures never reach (largest: sf0.1, N = 2 000). BASELINE.md rows 1–8
  * (compare/roubust.py:158–266) are measured at N = 10 000; RESULTS.md's
  * N-scaling section extrapolates the measured ≈0.08·n per-group margins to
  * predict the published BER-0-through-p≈0.4 plateau at that N. This probe
  * RUNS the curves there: a deterministic N = 10 000 × d = 64 fixture of
  * keyed-md5 gaussians (Hashing.gauss — the same public Box–Muller-over-md5
  * technique the deterministic LSH projections use), the reference's exact
  * parameters, the same `robustnessGrid` the driver-gated queries run.
  *
  * Usage: `Test/runMain graft.Curves10kProbe [n]` (default 10000).
  */
object Curves10kProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val d = 64
    val genUdf = udf((id: Long) =>
      Array.tabulate(d)(j => graft.functions.Hashing.gauss(s"n10k|$id|$j").toFloat))
    val emb = spark.range(n)
      .select(col("id").as("vec_id"), genUdf(col("id")).as("embedding"))
      .cache()
    println(s"FIXTURE n=${emb.count()} d=$d (keyed-md5 gaussians)")
    val wm  = "001010010101001010010" // len 21, as compare/roubust.py:162
    val ps  = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)
    val wmKey = WmKey(seed = "20")
    val scpwKey = ScpwKey(topK = 20, position = 30, stdE = 0.05, seed = "20")
    for ((scheme, attack, strength, th) <- Seq(
        (Experiments.SchemeTvp, "adaptive_delete", 0.54, 1.0),
        (Experiments.SchemeTvp, "random_delete", 0.54, 1.0),
        (Experiments.SchemeRs, "random_delete", 0.54, 1.0),
        (Experiments.SchemeScpw, "random_delete", 0.55, 1.0),
        (Experiments.SchemeTvp, "adaptive_modify", 0.55, 1.0))) {
      val t0 = System.nanoTime()
      val grid = Experiments.robustnessGrid(emb, Seq(scheme), Seq(attack), ps,
        reps = 10, wm, strength, th, d, wmKey, scpwKey)
      val avg = grid.groupBy("p").avg("ber").orderBy("p").collect()
        .map(r => f"${r.getDouble(1)}%.4f").mkString(", ")
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"CURVE $scheme/$attack strength=$strength: $avg (${secs}%.0f s)")
    }
    spark.stop()
  }
}
