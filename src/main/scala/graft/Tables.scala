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

  /** Embedding vectors as `array<float>` — the element type every kernel,
    * Encoder, and oracle fold is written against. The driver's fixture
    * generator has changed physical types between rounds before (events.ts,
    * r9); if `embedding` ever arrives as array<double>, cast at the read
    * boundary instead of breaking every `as[(Long, Array[Float])]` downstream
    * (a no-op — not even a plan node — while the fixture stays float).
    */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "embeddings")
    df.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => df
      case _ => df.withColumn("embedding",
        org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
    }
  }
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
