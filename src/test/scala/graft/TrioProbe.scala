package graft
import org.apache.spark.sql.SparkSession
object TrioProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_stream_tumbling", "q_stream_dedup", "q_stream_sessions")
    (1 to 3).foreach { pass =>
      GraftCache.clear(); spark.catalog.clearCache()
      val times = names.map { n =>
        val t0 = System.nanoTime(); SparkEntry.queries(n)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TRIO pass$pass total=${times.sum}%6.2f  " + names.zip(times).map{case(n,t)=>f"$n=$t%5.2f"}.mkString(" "))
    }
    spark.stop()
  }
}
