package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Measurement aid (guide §1/§7.1, headless stand-in for the UI's Jobs
  * page): runs each named query once warm and prints every Spark job it
  * fired — duration, stage count, and the job's first-stage callsite — so
  * a multi-second query can be attributed to its driver-sequential job
  * chain without the UI.
  */
object JobProbe {
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
    val starts = TrieMap[Int, (Long, String, Int)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.headOption.map(_.details.linesIterator
          .find(l => l.contains("graft") && !l.contains("JobProbe"))
          .getOrElse(js.stageInfos.head.name)).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site, js.stageInfos.size))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        tasks.addAndGet(sc.stageInfo.numTasks.toLong)
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site, nStages) =>
          val ms = (System.nanoTime() - t0) / 1e6
          lines.add((ms.toLong, f"  job ${je.jobId}%4d ${ms}%8.0f ms stages=$nStages%-3d $site"))
        }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm pass: memos built, JIT done
      spark.sparkContext.addSparkListener(listener)
      lines.clear(); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200)
      println(f"==== $name total=$total%6.2f s jobs=${lines.size} tasks=${tasks.get} ====")
      lines.forEach(l => println(l._2))
    }
    spark.stop()
  }
}
