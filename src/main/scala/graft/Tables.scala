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

  /** The events fixture stores TIMESTAMP(NANOS) which Spark's vectorized
    * parquet reader rejects; read nanos as long (`ts_ns`) — integer
    * nanoseconds keep sub-second ordering exact (a double would lose
    * precision above 2^53).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events").withColumnRenamed("ts", "ts_ns")
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
}
