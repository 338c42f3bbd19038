package graft.attacks

import graft.functions.GraftCols
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Attack operators (reference roubust/roubust.py, SCPW.py:269–290,
  * tabularMark.py:192–219) over `(vec_id, embedding)` frames.
  *
  * All randomness is keyed (see Hashing): a "random" choice of rows is the
  * first-k rows in md5-keyed order — same distribution as
  * `np.random.choice(..., replace=False)`, but reproducible on any cluster
  * and mirrorable in oracle SQL (DuckDB md5 hex sorts identically).
  */
object Attacks {

  private def nRows(df: DataFrame): Long = df.count()

  /** K1 — random deletion (SCPW.py:269–290, roubust/roubust.py:76–97).
    * Quirk preserved: the reference samples the KEEP-set of size
    * n − ceil(n·p), so exactly ceil(n·p) rows disappear.
    */
  def randomDelete(df: DataFrame, p: Double, seed: String): DataFrame = {
    val n    = nRows(df)
    val keep = n - math.ceil(n * p).toLong
    val w    = Window.orderBy(GraftCols.keyedHash(col("vec_id"), lit("del"), lit(seed)), col("vec_id"))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= keep)
      .drop("rn")
  }

  /** K2 — adaptive deletion (watermarking.py:430–443): drop the top
    * ceil(n·p) rows by accessibility index (descending). `ai` = (vec_id, ai).
    */
  def adaptiveDelete(df: DataFrame, ai: DataFrame, p: Double): DataFrame = {
    val n    = nRows(df)
    val drop = math.ceil(n * p).toLong
    val w    = Window.orderBy(col("ai").desc, col("vec_id"))
    df.join(ai, "vec_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > drop)
      .drop("rn", "ai")
  }

  /** Shared body of K3/K4 (roubust/roubust.py:99–156, tabularMark.py:192–219):
    * overwrite a run of `runLength` consecutive dims (mod d) with one uniform
    * value drawn from the global [min,max] of dim `dim0` — where `dim0` is a
    * keyed draw made ONCE (the reference's initial `np.random.randint`), and
    * the run start is re-rolled per row when `rerollDim` (adaptive_modify and
    * the tabularMark variant re-roll; roubust random_modify does not).
    */
  private def modifyRows(df: DataFrame, selected: Column, d: Int, runLength: Int,
                         rerollDim: Boolean, seed: String): DataFrame = {
    val dim0 = graft.functions.Hashing.md5Mod(s"$seed|dim0", d.toLong).toInt
    val mm = df.agg(
      min(element_at(col("embedding"), dim0 + 1)).as("mn"),
      max(element_at(col("embedding"), dim0 + 1)).as("mx")).head
    val (mn, mx) = (mm.getFloat(0).toDouble, mm.getFloat(1).toDouble)
    val newValue = (lit(mn) + (lit(mx) - lit(mn)) *
      GraftCols.keyedUnit(col("vec_id"), lit("modval"), lit(seed))).cast("float")
    val runStart =
      if (rerollDim)
        graft.functions.Md5ModExpr(concat_ws("#", col("vec_id"), lit("moddim"), lit(seed)), d.toLong).cast("int")
      else lit(dim0)
    df.withColumn("__sel", selected)
      .withColumn("embedding",
        when(col("__sel"),
          transform(col("embedding"), (x, i) =>
            when(pmod(i - runStart, lit(d)) < runLength, newValue).otherwise(x)))
        .otherwise(col("embedding")))
      .drop("__sel")
  }

  /** K3 — random modification (roubust/roubust.py:132–156): ceil(n·p) random
    * rows, ONE fixed dim overwritten per row (runLength=1, no re-roll).
    */
  def randomModify(df: DataFrame, p: Double, d: Int, seed: String,
                   runLength: Int = 1, rerollDim: Boolean = false): DataFrame = {
    val n      = nRows(df)
    val nMod   = math.ceil(n * p).toLong
    val w      = Window.orderBy(GraftCols.keyedHash(col("vec_id"), lit("modrow"), lit(seed)), col("vec_id"))
    val ranked = df.withColumn("__rn", row_number().over(w))
    modifyRows(ranked, col("__rn") <= nMod, d, runLength, rerollDim, seed).drop("__rn")
  }

  /** K4 — adaptive modification (roubust/roubust.py:99–130): top ceil(n·p)
    * rows by accessibility index, 30-run overwrite with per-row re-rolled dim.
    */
  def adaptiveModify(df: DataFrame, ai: DataFrame, p: Double, d: Int, seed: String,
                     runLength: Int = 30): DataFrame = {
    val n    = nRows(df)
    val nMod = math.ceil(n * p).toLong
    val w    = Window.orderBy(col("ai").desc, col("vec_id"))
    val ranked = df.join(ai, "vec_id").withColumn("__rn", row_number().over(w))
    modifyRows(ranked, col("__rn") <= nMod, d, runLength, rerollDim = true, seed)
      .drop("__rn", "ai")
  }

  /** K5 — insertion (roubust/roubust.py:185–208): append ceil(n·p) synthetic
    * rows ~ N(μ_col, σ_col) per dimension (A12 stats), ids continuing after
    * max(vec_id). Gaussians via Box–Muller over keyed uniforms — pure
    * column expressions, no UDF.
    */
  def insert(df: DataFrame, p: Double, d: Int, seed: String): DataFrame = {
    val spark = df.sparkSession
    val n     = nRows(df)
    val nIns  = math.ceil(n * p).toLong
    val maxId = df.agg(max(col("vec_id"))).head.getLong(0)
    val stats = df
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos").agg(avg("v").as("mu"), stddev_pop("v").as("sigma"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val gaussCols = (0 until d).map { j =>
      val (mu, sigma) = stats(j)
      val u1 = lit(1.0) - GraftCols.keyedUnit(col("vec_id"), lit(s"ins$j-u1"), lit(seed))
      val u2 = GraftCols.keyedUnit(col("vec_id"), lit(s"ins$j-u2"), lit(seed))
      (lit(mu) + lit(sigma) * sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)).cast("float")
    }
    val synthetic = spark.range(nIns)
      .select((col("id") + lit(maxId + 1)).as("vec_id"))
      .withColumn("embedding", array(gaussCols: _*))
    df.select("vec_id", "embedding").unionByName(synthetic)
  }
}
