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

  /** `ts` → long `ts_ns`: nanos longs pass through; NTZ wall clocks are
    * decomposed FIELD-WISE (date diff + hour/minute + fractional-second
    * extract — all timezone-free on TIMESTAMP_NTZ) so the epoch is the wall
    * clock read as UTC REGARDLESS of spark.sql.session.timeZone. The previous
    * cast-to-LTZ shape was only correct under a UTC session — any other
    * session tz silently shifted every event, non-uniformly across DST gaps.
    * Instant-typed (LTZ) columns go straight through unix_micros, which is
    * tz-free by construction.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumnRenamed("ts", "ts_ns")
      case TimestampNTZType =>
        val t = df.col("ts")
        // whole seconds in long arithmetic; sub-second micros from the
        // decimal(8,6) SECOND field (exact — micros precision, tiny decimal)
        val wholeSecs = datediff(to_date(t), lit(java.sql.Date.valueOf("1970-01-01"))).cast("long") * 86400L +
          hour(t).cast("long") * 3600L + minute(t).cast("long") * 60L
        val fracUs = (date_part(lit("SECOND"), t) * lit(1000000)).cast("long")
        df.withColumn("ts_ns", (wholeSecs * 1000000L + fracUs) * 1000L).drop("ts")
      case TimestampType =>
        df.withColumn("ts_ns", unix_micros(df.col("ts")) * 1000L).drop("ts")
      case _ =>
        df.withColumn("ts_ns", unix_micros(df.col("ts").cast("timestamp")) * 1000L).drop("ts")
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
}
