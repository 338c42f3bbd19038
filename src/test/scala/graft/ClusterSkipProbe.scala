package graft

import graft.functions.ZOrder
import graft.sources.TableLog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what `TableLog.overwriteClustered` is FOR at a scale where the
  * manifest grain is plural: MANIFEST-level multi-dimensional data
  * skipping. Run: `Test/runMain graft.ClusterSkipProbe [nRows] [nBuckets]`
  * (default 5,000,000 rows into 256 Hilbert buckets — a 16×16 cell grid
  * over two uniform dimensions).
  *
  * Two layouts of the same TableLog table: v1 a single unclustered commit,
  * v2 the clustered OPTIMIZE. For a 1-D slice (1/16 of one axis) and the
  * 2-D box (1/16 × 1/16), reports the directories RESOLVED by the manifest
  * (the skipping the fixture spec pins at 16 cells, here at 256) and the
  * wall-clock of the pruned read + row filter vs the same filter over the
  * unclustered head. Expectation: the 1-D slice resolves ~1/16 of the
  * dirs, the box ~1/256 (both + boundary cells), and the read time follows
  * the dirs — the list-selection happens before Spark plans anything.
  */
object ClusterSkipProbe {
  def main(args: Array[String]): Unit = {
    val n  = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nb = args.lift(1).map(_.toInt).getOrElse(256)
    val bits = 10 // per-axis resolution; bucket = top bits of the 2*bits code
    val shift = 2 * bits - (31 - Integer.numberOfLeadingZeros(nb)) // log2(nb)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    def hashT(seed: String, m: Long) =
      conv(substring(md5(concat(lit(seed), col("id"))), 1, 12), 16, 10)
        .cast("long") % m

    val dom = 1L << bits
    val base = spark.range(n).select(
      hashT("x", dom).as("x"), hashT("y", dom).as("y"),
      col("id").as("payload"))
    val t = java.nio.file.Files.createTempDirectory("graft_clusterskip")
      .toFile.getAbsolutePath
    time(s"v1: unclustered commit ($n rows)") {
      TableLog.overwrite(base, t, statsCols = Seq("x", "y"))
    }
    time(s"v2: OPTIMIZE into $nb Hilbert buckets") {
      TableLog.overwriteClustered(TableLog.read(spark, t, Some(1)), t,
        shiftright(ZOrder.hilbert2(col("x"), col("y"), bits), shift),
        statsCols = Seq("x", "y"))
    }
    val total = TableLog.manifest(t, 2).size
    val slice = (0L, dom / 16 - 1)
    val d1 = TableLog.pruneDirsRange(t, "x", slice._1, slice._2).size
    println(s"dirs total=$total  x-slice resolves $d1  " +
      f"(${d1 * 100.0 / total}%.1f%% vs the 1-D ideal ${100.0 / 16}%.1f%%)")
    val es = TableLog.manifest(t, 2).count { e =>
      Seq("x", "y").forall { c =>
        TableLog.entryStats(e).get(c)
          .forall { case (mn, mx) => mx >= slice._1 && mn <= slice._2 }
      }
    }
    println(s"2-D box resolves $es dirs " +
      f"(${es * 100.0 / total}%.1f%% vs the 2-D ideal ${100.0 / 256}%.2f%%)")
    def count(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("x").between(slice._1, slice._2) &&
        col("y").between(slice._1, slice._2)).count()
    val full = time("box filter over UNCLUSTERED v1") {
      count(TableLog.read(spark, t, Some(1)))
    }
    val pruned = time("box filter via readWhereRanges over v2") {
      count(TableLog.readWhereRanges(spark, t,
        Seq(("x", slice._1, slice._2), ("y", slice._1, slice._2))))
    }
    assert(full == pruned, s"row sets diverged: $full vs $pruned")
    println(s"rows matched: $full (identical both paths)")
    spark.stop()
  }
}
