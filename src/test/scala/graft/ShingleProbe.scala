package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: the higher-order-function shingle-set expression (sequence →
  * transform → slice/concat_ws → array_distinct; HOFs evaluate interpreted,
  * outside whole-stage codegen) vs a single-pass Scala UDF (one tokenize,
  * one LinkedHashSet). Run: `Test/runMain graft.ShingleProbe`.
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir).cache()
    docs.count()
    val n = 3
    def timed(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        val c = f
        println(f"$tag%-8s pass$p ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($c rows)")
      }
    }
    val words = split(col("text"), " ")
    timed("hof") {
      docs.filter(size(words) >= n)
        .withColumn("__shset", array_distinct(transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n))))))
        .select(col("doc_id"), size(col("__shset")).cast("long").as("sz"),
          explode(col("__shset")).as("shingle"))
        .count()
    }
    val shUdf = udf((text: String) => {
      val ws = text.split(" ", -1)
      val out = new java.util.LinkedHashSet[String]
      var i = 0
      while (i + n <= ws.length) {
        val sb = new java.lang.StringBuilder(ws(i))
        var j = 1
        while (j < n) { sb.append(' '); sb.append(ws(i + j)); j += 1 }
        out.add(sb.toString)
        i += 1
      }
      import scala.jdk.CollectionConverters._
      out.asScala.toArray
    })
    timed("udf") {
      docs.filter(size(words) >= n)
        .withColumn("__shset", shUdf(col("text")))
        .select(col("doc_id"), size(col("__shset")).cast("long").as("sz"),
          explode(col("__shset")).as("shingle"))
        .count()
    }
    spark.stop()
  }
}
