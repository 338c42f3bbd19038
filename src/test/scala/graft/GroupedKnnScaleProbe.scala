package graft
import graft.knn.Knn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Broadcast-kernel vs executor-side COGROUPED grouped search at a shape
  * near the broadcast regime's ceiling — the dispatch boundary
  * Knn.exactGrouped crosses at `graft.knn.broadcastMaxBytes`. 5M corpus
  * rows × d = 64 is ~1.36 GB of flat index: the broadcast kernel funnels
  * it through the driver (toLocalIterator) and ships it whole; the
  * cogrouped kernel shuffles corpus + queries on (group, sub) and builds
  * each sub-index inside its own task — no driver in the data path, no
  * resident-set bound, per-task memory = one sub-index. Parity is asserted
  * on a query sample (bit-identical by construction — same searchOne, same
  * tie-breaks; KnnWallSpec gates it at fixture scale).
  * Run: `Test/runMain graft.GroupedKnnScaleProbe [nCorpus] [nQueries]`
  * (defaults 5M / 2000; needs SPARK_DRIVER_MEM≈28g for the broadcast leg).
  */
object GroupedKnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nCorpus  = args.headOption.map(_.toInt).getOrElse(5000000)
    val nQueries = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val d = 64; val groups = 64
    val gen = udf((id: Long) => Array.tabulate(d)(j =>
      (graft.functions.Hashing.unitUniform(s"$id/$j").toFloat - 0.5f)))
    val corpus = spark.range(nCorpus)
      .select(col("id").as("vec_id"), gen(col("id")).as("embedding"),
        (col("id") % groups).cast("double").as("grp")).cache()
    val queries = spark.range(nQueries)
      .select(col("id").as("vec_id"), gen(col("id") + 1000000000L).as("embedding"),
        (col("id") % groups).cast("double").as("grp")).cache()
    println(s"grouped-knn: corpus ${corpus.count()} queries ${queries.count()} groups $groups")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gknn] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    var bcast: org.apache.spark.sql.DataFrame = null
    (1 to 2).foreach { p =>
      bcast = time(s"broadcast kernel p$p") {
        val r = Knn.exactGrouped(queries, corpus, 10, "grp", kernel = "fold")
          .localCheckpoint()
        r.count(); r
      }
    }
    var cog: org.apache.spark.sql.DataFrame = null
    (1 to 2).foreach { p =>
      cog = time(s"cogrouped kernel p$p") {
        val r = Knn.exactGroupedCogrouped(queries, corpus, 10, "grp", kernel = "fold")
          .localCheckpoint()
        r.count(); r
      }
    }
    val diff = bcast.exceptAll(cog).count() + cog.exceptAll(bcast).count()
    println(s"[gknn] parity: $diff differing rows (must be 0)")
    spark.stop()
  }
}
