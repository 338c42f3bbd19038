package graft
import graft.experiments.Experiments
import graft.watermark.{ScpwKey, WmKey}
import org.apache.spark.sql.SparkSession
object CurvesProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark,
      args.headOption.getOrElse("/root/testdata/sf0.01")).cache()
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
      val grid = Experiments.robustnessGrid(emb, Seq(scheme), Seq(attack), ps,
        reps = 10, wm, strength, th, 64, wmKey, scpwKey)
      val avg = grid.groupBy("p").avg("ber").orderBy("p").collect()
        .map(r => f"${r.getDouble(1)}%.4f").mkString(", ")
      println(s"CURVE $scheme/$attack strength=$strength: $avg")
    }
    spark.stop()
  }
}
