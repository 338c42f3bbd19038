package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for incremental partition maintenance (eventsIncrementalDir /
  * q_events_incremental): dynamic partition overwrite must replace ONLY the
  * partitions the delta touches — bootstrap partitions' files stay
  * physically untouched — while the default static mode would truncate the
  * whole store (the hazard the conf exists to exclude, pinned here so a
  * refactor that drops the conf fails loudly). Plus fixture-level parity of
  * the registered query against the direct full-table rollup.
  */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def files(dir: java.io.File): Map[String, Long] = {
    val fs = dir.listFiles((f: java.io.File) => f.getName.endsWith(".parquet"))
    if (fs == null) Map.empty else fs.map(f => f.getName -> f.lastModified).toMap
  }

  private def rm(f: java.io.File): Unit = {
    val k = f.listFiles(); if (k != null) k.foreach(rm); f.delete()
  }

  private def withTmp(body: java.io.File => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_incr_").toFile
    try body(tmp) finally rm(tmp)
  }

  test("dynamic overwrite replaces only the touched partitions") {
    import spark.implicits._
    withTmp { tmp =>
      val path = tmp.getAbsolutePath
      Seq(("A", 1L), ("A", 2L), ("B", 3L)).toDF("day", "v")
        .repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(path)
      val bootstrapA = files(new java.io.File(tmp, "day=A"))
      assert(bootstrapA.nonEmpty)

      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try Seq(("B", 30L), ("C", 4L)).toDF("day", "v") // B reprocessed, C new
        .repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(path)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }

      assert(files(new java.io.File(tmp, "day=A")) == bootstrapA,
        "an untouched bootstrap partition was rewritten")
      val got = spark.read.parquet(path).select("day", "v")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == Set(("A", 1L), ("A", 2L), ("B", 30L), ("C", 4L)),
        s"delta semantics wrong: $got (B must be replaced once, never unioned)")
    }
  }

  test("static overwrite truncates the store — the hazard dynamic mode excludes") {
    import spark.implicits._
    withTmp { tmp =>
      val path = tmp.getAbsolutePath
      Seq(("A", 1L), ("B", 3L)).toDF("day", "v")
        .write.mode("overwrite").partitionBy("day").parquet(path)
      assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        .equalsIgnoreCase("static"), "test assumes the session default")
      Seq(("C", 4L)).toDF("day", "v")
        .write.mode("overwrite").partitionBy("day").parquet(path)
      val got = spark.read.parquet(path).select("day").distinct()
        .collect().map(_.getString(0)).toSet
      assert(got == Set("C"),
        s"static overwrite kept $got — if this ever preserves A/B, the " +
          "dynamic-mode plumbing in eventsIncrementalDir is dead code")
    }
  }

  test("q_events_incremental equals the direct full-table rollup") {
    val dir = TestSpark.sf0001
    val us = expr("cast(floor(value * 1000000.0 + 0.5) as bigint)")
    val want = Tables.events(spark, dir)
      .withColumn("day", date_add(lit("1970-01-01").cast("date"),
        expr("cast(ts_ns div 86400000000000 as int)")))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum(us).as("sum_value_micros"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), col("sum_value_micros"))
      .orderBy("day").collect()
    val got = SparkEntry.queries("q_events_incremental")(spark, dir).collect()
    assert(want.length >= 28, s"fixture spans ${want.length} days — too few " +
      "for a meaningful bootstrap/delta split at the 2024-01-20 cutover")
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }
}
