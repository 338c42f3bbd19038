package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: is a dereferenced Dataset.localCheckpoint RDD collectable
  * (weak-valued SparkContext.persistentRdds + GC), or does something in the
  * session hold it strongly? Informs the Verify cache-hygiene assertion.
  */
object CkptLeakProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def settle(tag: String): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.sparkContext.getPersistentRDDs.nonEmpty && System.nanoTime() < deadline) {
        System.gc()
        Thread.sleep(300)
      }
      println(s"[probe] $tag remaining=${spark.sparkContext.getPersistentRDDs.size}")
    }

    var df = spark.range(100000L).selectExpr("id", "id * 2 as v").localCheckpoint()
    println(s"[probe] after ckpt count=${df.count()} persisted=${spark.sparkContext.getPersistentRDDs.size}")
    df = null
    settle("bare localCheckpoint")

    var df2 = Tables.embeddings(spark, "/root/testdata/sf0.001").localCheckpoint()
    println(s"[probe] emb ckpt count=${df2.count()} persisted=${spark.sparkContext.getPersistentRDDs.size}")
    df2 = null
    settle("embeddings localCheckpoint")

    spark.stop()
  }
}
