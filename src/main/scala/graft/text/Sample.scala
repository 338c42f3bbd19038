package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling for training-data curation — quality-weighted corpus
  * mixing as a deterministic, SQL-replayable operator.
  *
  * The scheme is PRIORITY SAMPLING (Duffield–Lund–Thorup, "Priority
  * sampling for estimation of arbitrary subset sums", JACM 54(6), 2007):
  * every row draws a keyed-md5 unit uniform u ∈ (0,1] and gets priority
  * q = w/u; the sample is the k largest priorities, and with
  * τ = the (k+1)-th priority, ŵ_i = max(w_i, τ) is an unbiased estimator
  * of w_i's contribution to any subset sum — near-optimal variance among
  * all k-sample schemes. Chosen over the classic Efraimidis–Spirakis
  * u^(1/w) key deliberately: ES needs `pow`, whose libm lanes differ
  * across engines, while priority sampling is ONE IEEE division per row —
  * bit-identical in Spark and DuckDB, so the sampled SET (not just its
  * size) is oracle-checkable.
  *
  * 100 TB shape: map-side priorities (md5 + one division, codegen'd), then
  * a global top-k via orderBy+limit — Spark plans TakeOrderedAndProject:
  * per-partition top-k, driver merge of |partitions|·k rows, no global
  * sort, no shuffle of the corpus. Rows with weight ≤ 0 get priority ≤ 0
  * and are effectively never sampled (documented, not an error — a
  * zero-quality doc is exactly what the weighting is for).
  */
object Sample {

  /** Keyed unit uniform in (0,1]: (first 52 md5 bits + 1) / 2^52. Priority
    * sampling (DLT) divides by u, so the draw must EXCLUDE 0 — the engine's
    * standard [0,1) draw (Hashing.unitUniform) would make the ~2⁻⁵²-rare
    * all-zero prefix yield priority = w/0 = ∞ (an unconditionally-sampled
    * row, violating the estimator's spec). The +1 shift is exact in both
    * engines (integer add before the one IEEE division), so the sampled SET
    * still replays bit-for-bit in DuckDB.
    */
  def unitCol(key: Column): Column =
    (conv(substring(md5(key), 1, 13), 16, 10).cast("long") + lit(1L))
      .cast("double") / lit(4503599627370496.0)

  /** The k highest-priority rows of `df`: (rank, original columns, weight,
    * priority). `idCol` must be unique per row (it keys the draw and breaks
    * exact priority ties deterministically).
    */
  def priorityTopK(df: DataFrame, idCol: String, weight: Column, k: Int,
                   seed: String): DataFrame = {
    val u = unitCol(concat(lit(s"$seed|"), col(idCol).cast("string")))
    val scored = df
      .withColumn("__w", weight)
      .withColumn("__pri", col("__w") / u)
      .orderBy(col("__pri").desc, col(idCol)) // TakeOrderedAndProject with the limit
      .limit(k)
    // rank over ≤ k rows — a single bounded window partition by design
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__pri").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
  }

  /** τ = the (k+1)-th largest priority (0 when the population has ≤ k
    * rows): the priority-sampling threshold. Σ max(w_i, τ) over the sample
    * is the unbiased estimate of the population's total weight.
    */
  def tau(df: DataFrame, idCol: String, weight: Column, k: Int,
          seed: String): Double = {
    val top = priorityTopK(df, idCol, weight, k + 1, seed)
    if (top.count() <= k) 0.0
    else top.filter(col("rank") === k + 1).select("__pri").head().getDouble(0)
  }
}
