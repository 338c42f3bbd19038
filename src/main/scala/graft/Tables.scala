package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table readers (TESTDATA.md). One parquet file per table;
  * `spark.read.parquet` gives Catalyst full pushdown/pruning on them.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")

  /** The events fixture's `ts` physical type has varied across driver
    * regenerations — TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * accepts as long via `nanosAsLong`) and micros-precision TIMESTAMP_NTZ.
    * Normalize both to integer epoch nanos (`ts_ns`): integer nanoseconds
    * keep sub-second ordering exact (a double would lose precision above
    * 2^53), and every downstream operator (EventOps, StreamOps) is written
    * against `ts_ns` so the fixture's physical choice stays invisible.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
  }

  /** `ts` → long `ts_ns`: nanos longs pass through; timestamp columns go
    * through unix_micros under the UTC session (the same NTZ/LTZ-agnostic
    * cast pattern as EventOps.epochSec — exact, micros carry no sub-µs).
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => df.withColumnRenamed("ts", "ts_ns")
    case _ => df.withColumn("ts_ns",
        org.apache.spark.sql.functions.unix_micros(
          df.col("ts").cast("timestamp")) * 1000L)
      .drop("ts")
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
}
