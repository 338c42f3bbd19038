package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Why is the one-pass multi-distinct profiler slow? A/B the Expand-based
  * multi-countDistinct against alternatives at sf0.1.
  * Run: `Test/runMain graft.ProfileProbe`.
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, dir).cache()
    li.count()
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def timed(tag: String)(f: => Unit): Unit =
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime(); f
        println(f"$tag%-28s pass$p ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    // A: the REJECTED naive shape (4 countDistinct + 16 other aggs in one
    // agg → a 5-branch Expand) — the shape PlanSpec bars the shipped
    // unpivot-first variant D from regressing to
    timed("A one-agg multi-distinct") {
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}_n"), countDistinct(col(c)).as(s"${c}_nd"),
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
          sum(col(c).cast("decimal(18,2)")).as(s"${c}_sum"))
      }
      li.agg(aggs.head, aggs.tail: _*).collect()
    }
    // B: non-distinct aggs in one pass + one groupBy-per-column distinct
    timed("B split distinct jobs") {
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}_n"),
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
          sum(col(c).cast("decimal(18,2)")).as(s"${c}_sum"))
      }
      li.agg(aggs.head, aggs.tail: _*).collect()
      cols.foreach(c => li.select(col(c)).distinct().count())
    }
    // C: distinct via per-column two-level agg unioned (one job)
    timed("C union two-level distinct") {
      val nd = cols.map(c =>
        li.groupBy(col(c).as("v")).agg(count(lit(1)))
          .agg(count(lit(1)).as("nd")).select(lit(c).as("col_name"), col("nd")))
        .reduce(_ unionByName _)
      nd.collect()
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}_n"),
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
          sum(col(c).cast("decimal(18,2)")).as(s"${c}_sum"))
      }
      li.agg(aggs.head, aggs.tail: _*).collect()
    }
    // D: unpivot to (col_name, v), then two-level agg — one shuffle, no Expand
    timed("D unpivot two-level") {
      val long = li.select(expr(
        s"stack(${cols.size}, " + cols.map(c => s"'$c', $c").mkString(", ") +
          ") as (col_name, v)"))
      long.groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
        .groupBy("col_name")
        .agg(sum("cnt").as("n"), count(lit(1)).as("n_distinct"),
          min("v").as("vmin"), max("v").as("vmax"),
          sum(col("v").cast("decimal(18,2)") * col("cnt")).as("vsum"))
        .withColumn("avg", col("vsum").cast("double") / col("n"))
        .collect()
    }
    println("== A executed plan ==")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"), countDistinct(col(c)).as(s"${c}_nd"),
        min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(col(c).cast("decimal(18,2)")).as(s"${c}_sum"))
    }
    println(li.agg(aggs.head, aggs.tail: _*).queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
