package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q3_shipping", "wm_content_id", "q5_region_revenue", "dedup_exact_groups",
                  "q_events_tumbling", "mean_distortion", "graph_cluster_stats")) {
      println(s"===== $q =====")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Broadcast") || l.contains("WholeStageCodegen")).take(8).foreach(l => println(l.trim.take(200)))
    }
    spark.stop()
  }
}
