package graft
import graft.knn.Knn
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iteration probe (not a test): task-time balance of Knn.exactGrouped on a
  * skewed grouped corpus with FEW queries — the regime the skew guard
  * targets. With ONE query in a 600k-row hot group, the unsplit plan scans
  * the whole group inside a single task while 31 cores idle; the guard fans
  * that query over ceil(600k/20k) = 30 sub-index units. Prints per-stage
  * (tasks, max-task-ms, sum-ms) so the search stage's max task can be
  * compared across the two paths.
  *
  * Local-mode caveat (measured): at local[32] every task shares ONE JVM, so
  * the first touch of the ~150 MB broadcast deserializes it under a lock and
  * that, not the scan, sets the max task time in BOTH paths — wall times come
  * out within noise and the split's effect is only visible structurally
  * (the hot query becomes 30 schedulable units). On a real cluster the
  * economics invert: the per-executor deserialization amortizes across a
  * stage's many tasks while a hot group is GBs, so the monolithic per-query
  * scan is the straggler the guard removes. The bit-exactness of the merged
  * result is what KnnGraphSpec asserts; this probe exists to keep the
  * local-mode measurement honest.
  */
object KnnSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = 64
    val gen = udf((id: Long) => Array.tabulate(d)(j =>
      (graft.functions.Hashing.unitUniform(s"$id/$j").toFloat - 0.5f)))
    // hot group 0: 600k rows; cold groups 1..9: 2k rows each
    val nHot = 600000L
    val corpus = spark.range(nHot + 18000).select(
      when(col("id") < nHot, lit(0.0)).otherwise((col("id") % 9 + 1).cast("double")).as("grp"),
      col("id").as("vec_id"), gen(col("id")).as("embedding")).cache()
    // ONE query in the hot group, one per cold group
    val queries = corpus.filter(
      col("vec_id") === 123 || (col("grp") =!= 0.0 && col("vec_id") % 2000 === 111)).cache()
    corpus.count(); println(s"queries: ${queries.count()}")

    val stageTasks = scala.collection.concurrent.TrieMap.empty[Int, List[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        stageTasks.updateWith(t.stageId)(v => Some(t.taskInfo.duration :: v.getOrElse(Nil)))
    })
    for ((label, maxRows) <- Seq(("unsplit", 1 << 20), ("split30", 20000))) {
      stageTasks.clear()
      val t0 = System.nanoTime()
      val n  = Knn.exactGrouped(queries, corpus, 10, "grp", maxIndexRows = maxRows).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      println(f"SKEW $label: wall $dt%.2f s, $n result rows; stages:")
      stageTasks.toSeq.sortBy(_._1).foreach { case (sid, ds) =>
        println(f"  stage $sid%3d: ${ds.length}%3d tasks, max ${ds.max}%5d ms, sum ${ds.sum}%6d ms")
      }
    }
    spark.stop()
  }
}
