package graft

import graft.attacks.Attacks
import graft.functions.GraftCols
import graft.watermark.{Tvp, WmKey}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with bit-exact DuckDB oracle SQL wherever the operator is
  * SQL-expressible (FIXTURES.md oracle-parity note). Non-SQL operators (the
  * bit codec of watermarking.py:53–117) are registered without oracle SQL and
  * carry invariant-based ScalaTest coverage instead.
  */
object SparkEntry {

  private val key       = WmKey(seed = "20")
  private val D         = 64 // fixture embedding dimensionality
  private val WM        = "10101"
  private val Strength  = 0.6
  private val DeleteP   = 0.3
  private val Seed      = "42"
  private lazy val dims = key.dims(D)

  /** Flagship on sf0.001: RS watermark round-trip — embeds WM, extracts it
    * back, returns per-bit (wm_bit, extracted_bit) rows.
    */
  def entry(spark: SparkSession): DataFrame =
    rsRoundtrip(spark, "/root/testdata/sf0.001")

  private def rsRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val emb  = Tables.embeddings(spark, dir)
    val wmDf = Tvp.embedRs(emb, WM, Strength, D, key)
    Tvp.bitsDf(spark, WM)
      .join(Tvp.extract(wmDf, WM.length, D, key), "bit_pos")
      .select(col("bit_pos").cast("long"), col("wm_bit").cast("long"),
        col("extracted_bit").cast("long"))
      .orderBy("bit_pos")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(38,6)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(38,6)")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(38,6)")).as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast("decimal(38,6)")).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "wm_content_id" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          GraftCols.contentIdCol(col("embedding"), dims.init.toSeq, key.scale).as("content_id"))
        .orderBy("vec_id")
    }),

    "wm_group_sizes" -> ((s, dir) => {
      Tvp.classify(Tables.embeddings(s, dir), D, WM.length, key)
        .groupBy(col("group_id").cast("long").as("group_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy("group_id")
    }),

    "wm_rs_roundtrip" -> ((s, dir) => rsRoundtrip(s, dir)),

    "attack_random_delete" -> ((s, dir) => {
      Attacks.randomDelete(Tables.embeddings(s, dir), DeleteP, Seed)
        .select("vec_id").orderBy("vec_id")
    }),
  )

  /** DuckDB-side content-id expression mirroring GraftCols.contentIdCol
    * (0-based dims; DuckDB list indexing is 1-based like element_at).
    */
  private def cidSql(ds: Seq[Int], scale: Double): String =
    ds.map(d => s"substr(cast(cast(trunc(abs(embedding[${d + 1}]) * $scale) as bigint) as varchar),1,1)")
      .mkString(" || ")

  /** DuckDB Horner fold = full-128-bit int(md5hex,16) % m (Hashing.md5Mod). */
  private def md5ModSql(expr: String, m: Int): String =
    s"cast(list_reduce(list_transform(string_split(md5($expr), ''), " +
      s"x -> strpos('0123456789abcdef', x) - 1), (a, b) -> (a * 16 + b) % $m) as bigint)"

  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(cast(l_quantity as decimal(38,6))) AS sum_qty,
        |  sum(cast(l_extendedprice as decimal(38,6))) AS sum_base_price,
        |  sum(cast(l_extendedprice * (1.0 - l_discount) as decimal(38,6))) AS sum_disc_price,
        |  sum(cast(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) as decimal(38,6))) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "wm_content_id" ->
      s"""SELECT vec_id, ${cidSql(dims.init.toSeq, key.scale)} AS content_id
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "wm_group_sizes" ->
      s"""WITH c AS (SELECT ${cidSql(dims.init.toSeq, key.scale)} AS content_id FROM embeddings)
         |SELECT ${md5ModSql("content_id", WM.length)} AS group_id, count(*) AS n
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "attack_random_delete" ->
      s"""WITH ranked AS (
         |  SELECT vec_id,
         |    row_number() OVER (ORDER BY md5(cast(vec_id as varchar) || '#del#$Seed'), vec_id) AS rn,
         |    count(*) OVER () AS n
         |  FROM embeddings)
         |SELECT vec_id FROM ranked WHERE rn <= n - ceil(n * $DeleteP) ORDER BY vec_id""".stripMargin,
  )
}
