package graft
import org.apache.spark.sql.SparkSession

/** Measurement aid (guide §1/§7.2): per query, split wall time into
  * build (SparkEntry fn → DataFrame, includes memoized-artifact actions),
  * plan (analysis + optimization + physical planning of the final frame),
  * and exec (the count action; with AQE on, runtime re-planning is charged
  * here, as in the bench). Two rounds per query: round 2 shows the
  * memo-warm per-call cost.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach { n =>
      try {
        val df = if (n == "events") Tables.events(spark, dir) else Tables.load(spark, dir, n)
        df.count()
      } catch { case _: Throwable => () }
    }
    (1 to 2).foreach { round =>
      args.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"PHASE r$round $name%-28s build=${(t1 - t0) / 1e9}%7.2f " +
          f"plan=${(t2 - t1) / 1e9}%6.2f exec=${(t3 - t2) / 1e9}%7.2f")
      }
    }
    spark.stop()
  }
}
