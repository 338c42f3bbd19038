package graft
import graft.sources.TableLog
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession

/** Quantifies the r17 whole-backlog IVM catch-up: a consumer that was down
  * for N source commits converging via ONE changeFeed(cur, head) fold vs
  * the r16 one-version-per-tick walk. Both consumers maintain the same
  * per-type rollup over the same N-commit TableLog table; final states are
  * asserted equal. The stepping side pays N × (feed resolve + full-outer
  * merge + commit); the folded side pays ONE of each, and its feed read
  * touches only the directories the two ENDPOINT manifests don't share —
  * so the gap widens both with backlog length and with intermediate churn
  * (every add-then-delete inside the span is never read at all).
  * Run: `Test/runMain graft.CatchupScaleProbe [commits]` (default 100).
  */
object CatchupScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val commits = args.headOption.map(_.toInt).getOrElse(100)
    def tmp() = java.nio.file.Files
      .createTempDirectory("graft_catchup").toFile.getAbsolutePath
    val table = tmp()
    val t0 = System.nanoTime()
    (1 to commits).foreach { i =>
      TableLog.append(Seq((s"t${i % 7}", i.toLong)).toDF("event_type", "us"), table)
    }
    println(f"[catchup] build: $commits commits in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // fixed tick count, convergence asserted OUTSIDE the timer: tick 1 is
    // bootstrap + one step (cursor 1 → 2), so commits−1 ticks converge —
    // a per-tick convergence read would inflate the stepping side with
    // work the real consumer never does (it resolves its cursor internally)
    val vStep = tmp()
    val ticks = commits - 1
    val t1 = System.nanoTime()
    (0 until ticks).foreach(i =>
      StreamOps.changeFeedIvm(table, vStep, maxVersionsPerTick = 1)(
        spark.range(1).toDF(), i.toLong))
    val stepSecs = (System.nanoTime() - t1) / 1e9
    require(TableLog.read(spark, vStep)
      .agg(org.apache.spark.sql.functions.max("__v")).head().getInt(0) == commits,
      "stepping consumer did not converge in commits-1 ticks")
    println(f"[catchup] stepping: $ticks ticks, $stepSecs%.1f s")

    val vFold = tmp()
    val t2 = System.nanoTime()
    StreamOps.changeFeedIvm(table, vFold)(spark.range(1).toDF(), 0L)
    val foldSecs = (System.nanoTime() - t2) / 1e9
    println(f"[catchup] folded:   1 tick,  $foldSecs%.1f s  (${stepSecs / foldSecs}%.0f x)")

    val a = TableLog.read(spark, vStep).collect().map(_.toSeq).toSet
    val b = TableLog.read(spark, vFold).collect().map(_.toSeq).toSet
    require(a == b, s"states diverged: stepping=$a folded=$b")
    println(s"[catchup] final states identical (${a.size} groups)")
    spark.stop()
  }
}
