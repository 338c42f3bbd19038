package graft

import graft.experiments.Experiments
import graft.graph.KnnGraph
import graft.watermark.{ScpwKey, WmKey}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profiling probe: where does h_robustness_grid's wall-clock go —
  * the per-scheme embeds, the accessibility build, or the berGrid
  * tagged-union extraction? Run with
  * `Test/runMain graft.GridProfileProbe [sfDir]`.
  */
object GridProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val emb = Tables.embeddings(spark, sfDir).cache()
    emb.count()
    val wmKey   = WmKey(seed = "20")
    val scpwKey = ScpwKey(topK = 20, position = 30, stdE = 0.05, seed = "20")
    val wm = "10101"
    val attacks = Seq("random_delete", "adaptive_delete", "random_modify",
      "adaptive_modify", "insert")
    val ps = Seq(0.0, 0.1, 0.3, 0.5, 0.7, 0.8)
    val ai = time("accessibility build") {
      KnnGraph.accessibility(emb, KnnGraph.edges(emb, 8)).localCheckpoint()
    }
    for (scheme <- Seq(Experiments.SchemeRs, Experiments.SchemeTvp, Experiments.SchemeScpw)) {
      val wmDf = time(s"embed $scheme") {
        Experiments.embedFor(emb, scheme, wm, 0.7, 0.5, 64, wmKey, scpwKey, Some(ai))
          .localCheckpoint()
      }
      time(s"berGrid $scheme (30 cells)") {
        Experiments.berGrid(wmDf, scheme, 0, attacks, ps, wm, 64, wmKey, scpwKey, Some(ai))
      }
    }
    spark.stop()
  }
}
