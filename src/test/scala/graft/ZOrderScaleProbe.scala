package graft

import graft.functions.ZOrder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the z-order layout is FOR: parquet row-group statistics
  * pruning under 2-D selective predicates, at a scale where row groups are
  * plural. Run: `Test/runMain graft.ZOrderScaleProbe [nRows]` (default
  * 5,000,000; row groups forced small so the 5M-row file carries hundreds).
  *
  * Three layouts of the same table (user 0..2047 × time 0..2^20, uniform):
  * unsorted (insert order), lexicographic (user, t) sort, and Morton
  * z-order — then a user-slice predicate, a time-slice predicate, and the
  * 2-D intersection, each counted 3× per layout. Expectation: the lex sort
  * wins on its primary column and does nothing for the time slice; z-order
  * prunes BOTH; unsorted prunes neither.
  */
object ZOrderScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // small row groups: the pruning unit must be plural at probe scale
      .config("spark.hadoop.parquet.block.size", (1 << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    def hashT(seed: String, m: Long) =
      conv(substring(md5(concat(lit(seed), col("id"))), 1, 12), 16, 10)
        .cast("long") % m

    val base = spark.range(n).select(
      hashT("u", 2048L).as("user_id"),
      hashT("t", 1L << 20).as("t"),
      hashT("v", 1024L).as("v"),
      col("id").as("payload"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder_probe")
      .toFile.getAbsolutePath
    time("write unsorted") {
      base.coalesce(8).write.parquet(s"$tmp/unsorted")
    }
    time("write lex (user, t)") {
      base.repartitionByRange(8, col("user_id"), col("t"))
        .sortWithinPartitions("user_id", "t").write.parquet(s"$tmp/lex")
    }
    time("write zorder (raw, unbalanced)") {
      // DELIBERATE pitfall demo: t has 20 bits to user's 11, so t's high
      // bits own the code's high bits and the sort degenerates to ~1-D on t
      base.withColumn("__z", ZOrder.morton2(col("user_id"), col("t")))
        .repartitionByRange(8, col("__z")).sortWithinPartitions("__z")
        .drop("__z").write.parquet(s"$tmp/zorder_raw")
    }
    time("write zorder (zBucket-normalized)") {
      base.withColumn("__z", ZOrder.morton2(col("user_id"),
          ZOrder.zBucket(col("t"), 1L << 20, 11)))
        .repartitionByRange(8, col("__z")).sortWithinPartitions("__z")
        .drop("__z").write.parquet(s"$tmp/zorder")
    }
    time("write zorder3 (user, t, v)") {
      // the 2-vs-3-column trade: each column now keeps ~1/3 of its
      // resolution instead of ~1/2 — v-slices gain pruning power the
      // 2-D layout cannot give them, while user/t slices get WEAKER
      base.withColumn("__z", ZOrder.morton3(col("user_id"),
          ZOrder.zBucket(col("t"), 1L << 20, 11), col("v")))
        .repartitionByRange(8, col("__z")).sortWithinPartitions("__z")
        .drop("__z").write.parquet(s"$tmp/zorder3")
    }

    val preds = Seq(
      "user slice (1/64)" -> (col("user_id") >= 512L && col("user_id") < 544L),
      "time slice (1/64)" -> (col("t") >= (1L << 14) * 20 && col("t") < (1L << 14) * 21),
      "2-D slice (1/4096)" -> (col("user_id") >= 512L && col("user_id") < 544L &&
        col("t") >= (1L << 14) * 20 && col("t") < (1L << 14) * 21))
    for ((layout, path) <- Seq("unsorted" -> "unsorted", "lex" -> "lex",
        "zorder" -> "zorder"); (ptag, pred) <- preds) {
      var cnt = 0L
      (1 to 3).foreach { p =>
        time(s"$layout $ptag p$p") {
          cnt = spark.read.parquet(s"$tmp/$path").filter(pred).count()
        }
      }
      println(s"  -> $layout / $ptag rows: $cnt")
    }

    // The DETERMINISTIC measure (wall clock at 5M × 3 columns is task-
    // overhead-bound): per layout, how many row groups' footer min/max
    // ranges survive each predicate — the exact unit parquet's statistics
    // pruning skips. This is the number that scales to 100 TB.
    import scala.jdk.CollectionConverters._
    def rowGroups(path: String): Seq[(Long, Long, Long, Long, Long, Long)] = {
      val conf = spark.sparkContext.hadoopConfiguration
      new java.io.File(path).listFiles().toSeq
        .filter(f => f.getName.endsWith(".parquet"))
        .flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getBlocks.asScala.toSeq.map { b =>
            def mm(name: String): (Long, Long) = {
              val s = b.getColumns.asScala
                .find(_.getPath.toDotString == name).get.getStatistics
              (s.genericGetMin.asInstanceOf[Number].longValue,
                s.genericGetMax.asInstanceOf[Number].longValue)
            }
            val (ul, uh) = mm("user_id"); val (tl, th) = mm("t")
            val (vl, vh) = mm("v")
            (ul, uh, tl, th, vl, vh)
          } finally r.close()
        }
    }
    val uLo = 512L; val uHi = 544L
    val tLo = (1L << 14) * 20; val tHi = (1L << 14) * 21
    val vLo = 320L; val vHi = 336L // 1/64 of the 1024-wide v domain
    for ((layout, path) <- Seq("unsorted" -> "unsorted", "lex" -> "lex",
        "zorder_raw" -> "zorder_raw", "zorder" -> "zorder",
        "zorder3" -> "zorder3")) {
      val rgs = rowGroups(s"$tmp/$path")
      def surv(f: ((Long, Long, Long, Long, Long, Long)) => Boolean) = rgs.count(f)
      val u = surv { case (ul, uh, _, _, _, _) => uh >= uLo && ul < uHi }
      val t = surv { case (_, _, tl, th, _, _) => th >= tLo && tl < tHi }
      val v = surv { case (_, _, _, _, vl, vh) => vh >= vLo && vl < vHi }
      val both = surv { case (ul, uh, tl, th, _, _) =>
        uh >= uLo && ul < uHi && th >= tLo && tl < tHi }
      val all3 = surv { case (ul, uh, tl, th, vl, vh) =>
        uh >= uLo && ul < uHi && th >= tLo && tl < tHi &&
          vh >= vLo && vl < vHi }
      println(f"$layout%-11s row groups: ${rgs.size}%4d total | " +
        f"user $u%4d | time $t%4d | v $v%4d | 2-D $both%4d | 3-D $all3%4d")
    }
    spark.stop()
  }
}
