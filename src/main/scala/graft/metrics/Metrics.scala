package graft.metrics

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Quality / impact metrics (SURVEY §2.6, §2.2 P16). */
object Metrics {

  /** P16 — mean embed distortion: avg ‖wm − orig‖ over all rows
    * (test_erro.py:43–46). Inputs are (vec_id, embedding) frames.
    */
  def meanDistortion(orig: DataFrame, wm: DataFrame): Double =
    orig.select(col("vec_id"), col("embedding").as("a"))
      .join(wm.select(col("vec_id"), col("embedding").as("b")), "vec_id")
      .agg(avg(VectorOps.l2Col(col("a"), col("b"))))
      .head().getDouble(0)

  /** Queries whose top-k contains a carrier (J4 semi-join shape,
    * impact/impact.py:51–59): knn results → (carrier, query) hit pairs.
    * `carriers` is a (vec_id) frame — small, broadcast.
    */
  def carrierHits(knn: DataFrame, carriers: DataFrame): DataFrame =
    knn.join(broadcast(carriers.select(col("vec_id"))),
        knn("neighbor_id") === col("vec_id"), "left_semi")
      .select(col("neighbor_id").as("carrier"), col("query_id").as("query"))

  /** SO1 — per-carrier miss/false counts between a baseline and an after
    * kNN pass (test_erro.py:69–87, impact/impact.py:82–99):
    * miss = queries that found the carrier before but not after;
    * false = queries that find it only after.
    * Returns (carrier, miss, false_hits).
    */
  def missFalse(baseHits: DataFrame, afterHits: DataFrame): DataFrame = {
    val b = baseHits.withColumn("in_base", lit(1))
    val a = afterHits.withColumn("in_after", lit(1))
    b.join(a, Seq("carrier", "query"), "full_outer")
      .groupBy("carrier")
      .agg(
        sum(when(col("in_base").isNotNull && col("in_after").isNull, 1).otherwise(0)).as("miss"),
        sum(when(col("in_after").isNotNull && col("in_base").isNull, 1).otherwise(0)).as("false_hits"))
  }

  /** SO2 — kNN hit-rate after an attack (`hit_rate`, data_attack.py:92–109):
    * |base ∩ after| / (nQueries · k) over (query_id, neighbor_id) pairs.
    */
  def hitRate(base: DataFrame, after: DataFrame, k: Int): Double = {
    val nQueries = base.select("query_id").distinct().count()
    if (nQueries == 0) return 0.0
    val common = base.select("query_id", "neighbor_id")
      .join(after.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"), "left_semi")
      .count()
    common.toDouble / (nQueries.toDouble * k)
  }

  /** SO3 — Jaccard overlap of two vector sets by full-row equality
    * (`calculate_overlap_ratio`, roubust/roubust.py:158–183).
    */
  def jaccardOverlap(a: DataFrame, b: DataFrame): Double = {
    val x  = a.select(col("embedding")).distinct()
    val y  = b.select(col("embedding")).distinct()
    val ix = x.intersect(y).count()
    val un = x.union(y).distinct().count()
    if (un == 0) 0.0 else ix.toDouble / un
  }
}
