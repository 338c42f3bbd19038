package graft
import org.apache.spark.sql.SparkSession
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime(); fn(spark, dir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); fn(spark, dir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"PROBE $name%-26s cold=$cold%7.2f warm=$warm%7.2f")
    }
    spark.stop()
  }
}
