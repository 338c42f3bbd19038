package graft
import graft.knn.Knn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = 64
    val gen = udf((id: Long) => Array.tabulate(d)(j =>
      (graft.functions.Hashing.unitUniform(s"$id/$j").toFloat - 0.5f)))
    val corpus = spark.range(200000).select(col("id").as("vec_id"), gen(col("id")).as("embedding")).cache()
    val queries = spark.range(20000).select(col("id").as("vec_id"), gen(col("id") + 1000000).as("embedding")).cache()
    corpus.count(); queries.count()
    for (kernel <- Seq("fast", "fold"); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = Knn.exact(queries, corpus, 10, kernel = kernel).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val gflops = 20000L * 200000L * d * 2 / dt / 1e9
      println(f"SCALE kernel=$kernel rep=$rep: $dt%.1f s ($n rows, ${gflops}%.0f GFLOP/s)")
    }
    spark.stop()
  }
}
