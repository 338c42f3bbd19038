package graft.watermark

import graft.functions.{GraftCols, Hashing}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SCPW — correlated-additive-noise watermarking (reference SCPW.py).
  *
  * Scheme: one fixed dimension `position` carries the mark. A noise value
  * e = kx·x + k1·u + k2 (u ~ N(0,1)) is added, with constants chosen from the
  * column's mean/variance so the column distribution is (approximately)
  * preserved (`found_e`, SCPW.py:31–62). The hidden bit of a vector is
  * md5(str(v[position])) % 2 XOR (pos(id) % 2) (SCPW.py:120–128); embedding
  * re-adds noise until the vector expresses the target bit (SCPW.py:216–223).
  *
  * Deviations (documented, SURVEY §7 hard parts): Python's sequential PRNG →
  * keyed draws; the rejection loop is capped at 64 re-draws (geometric with
  * p≈1/2 — the cap is unreachable in practice); the value hash renders the
  * float as an exact integer (floor(v·10⁶ + 0.5), the engine's micros
  * convention) instead of `str(float32)`. The hash's only role in the scheme
  * is to be a deterministic pseudorandom bit of the stored value — embed
  * re-checks with the same function the extractor uses, so ANY rendering
  * keeps the scheme self-consistent — and a decimal-repr rendering was
  * already a deviation (Java's Float.toString ≠ numpy's shortest repr in
  * corner cases); the integer rendering is the one choice BOTH engines (JVM
  * and the DuckDB oracle) compute bit-identically, which is what lets the
  * full embed→attack→extract grid be oracle-exact instead of rows-only.
  */
final case class ScpwKey(topK: Int = 20, position: Int = 30, stdE: Double = 1.8,
                         seed: String = "20", scale: Double = 1000.0)

object Scpw {

  /** Hidden bit of one vector (SCPW.py:120–128). The value hash keys on the
    * micros rendering (see the class doc's deviation note): an exact integer
    * both the JVM and DuckDB derive identically from the same float32.
    */
  def hiddenBit(vec: Array[Float], cid: String, position: Int): Int = {
    val pos          = Hashing.md5Mod(cid, vec.length.toLong).toInt
    val dimLowestBit = pos % 2
    val valueBit     = Hashing.md5Mod(microsRender(vec(position)), 2L).toInt
    valueBit ^ dimLowestBit
  }

  /** floor(v·10⁶ + 0.5) as a decimal integer string — the deterministic
    * rendering fed to the value hash. Oracle mirror:
    * `cast(cast(floor(cast(v as double) * 1000000.0 + 0.5) as bigint) as varchar)`.
    */
  def microsRender(v: Float): String =
    math.floor(v.toDouble * 1000000.0 + 0.5).toLong.toString

  /** A1 (SCPW flavor, SCPW.py:130–169): content id over the FIRST topK dims
    * (no drop-last — SCPW.py:73–84), md5 grouping, value-hash hidden bit
    * (native ScpwHiddenBitExpr).
    */
  def classify(df: DataFrame, l: Int, key: ScpwKey): DataFrame =
    df.withColumn("content_id",
        GraftCols.contentIdCol(col("embedding"), 0 until key.topK, key.scale))
      .withColumn("group_id", GraftCols.md5Mod(col("content_id"), l).cast("int"))
      .withColumn("hidden_bit",
        graft.functions.ScpwHiddenBitExpr(col("embedding"), col("content_id"), key.position))

  /** P10 — noise constants from column stats (`found_e`, SCPW.py:31–62).
    * μ/σ² derive from exact integer nano-sums (the scpw_column_stats
    * convention), NOT from double avg/var_pop: a double sum's value depends
    * on partition iteration order, and these constants feed the embedded
    * float32 values — the nano-sum form is partition-count-invariant and
    * bit-replayable in the DuckDB oracle. (Nano-sums of a bounded column
    * overflow int64 only past ~10¹³ rows; at that scale SCPW runs on a
    * sampled parameter estimate anyway.)
    */
  def noiseParams(df: DataFrame, key: ScpwKey): (Double, Double, Double) = {
    val vc = element_at(col("embedding"), key.position + 1).cast("double")
    val r = df.agg(
      sum(floor(vc * lit(1000000000.0) + lit(0.5)).cast("long")).as("sv"),
      sum(floor(vc * vc * lit(1000000000.0) + lit(0.5)).cast("long")).as("sq"),
      count(lit(1)).as("n")).head()
    val n  = r.getLong(2).toDouble
    val mu = r.getLong(0).toDouble / 1000000000.0 / n
    val v  = math.max(r.getLong(1).toDouble / 1000000000.0 / n - mu * mu, 0.0)
    val kx = -key.stdE * key.stdE / (2 * v)
    val k1 = math.sqrt(key.stdE * key.stdE - kx * kx * v)
    val k2 = -kx * mu
    (kx, k1, k2)
  }

  /** P11 — embed with bounded rejection (SCPW.py:210–225). The reference
    * draws noise from a pre-materialized pool E (one e per corpus row) at
    * PRNG-chosen indices; here each draw recomputes e from a keyed-chosen
    * column value + keyed gaussian — same distribution, no pool shuffle.
    * Additions accumulate in float32 exactly as numpy's `+=` does.
    */
  /** Carrier pick (deficit + keyed per-group ranking over the non-expressing
    * candidates) — exposed so harnesses (e.g. the impact comparison) can
    * account hits against the same set the embed modifies.
    * Returns (vec_id, wm_bit, content_id).
    */
  def carriers(df: DataFrame, wm: String, strength: Double, key: ScpwKey): DataFrame = {
    val classified = classify(df, wm.length, key)
    val bits       = Tvp.bitsDf(df.sparkSession, wm)
    val needs      = Tvp.groupNeeds(classified, bits, strength)
    val cand = classified.join(broadcast(needs), "group_id")
      .filter(col("hidden_bit") =!= col("wm_bit"))
      .withColumn("__key", GraftCols.keyedHash(col("vec_id"), lit("scpw"), lit(key.seed)))
    // dual-regime rank (Tvp.groupedRank): plain group_id window at
    // driver-known fixture scale, bucket-distributed above ~1e6 rows —
    // row-identical either way, without the L-partition sort wall at scale
    val big = Tvp.nRows(df) > Tvp.smallRankMax(df.sparkSession)
    Tvp.groupedRank(cand, Seq("group_id"),
        conv(substring(col("__key"), 1, 4), 16, 10).cast("int"),
        Seq(col("__key"), col("vec_id")), "rn", distributed = big)
      .filter(col("rn") <= col("need"))
      .select(col("vec_id"), col("wm_bit"), col("content_id"))
  }

  /** The driver-side embed artifacts — noise-ingredient pool + noise
    * constants — computed once per (corpus, key) and reusable across embed
    * calls (each costs a count + a TakeOrdered collect + one stats agg;
    * harnesses that embed the same corpus repeatedly should memoize this).
    */
  final case class ScpwPrep(pool: Array[Float], kx: Double, k1: Double, k2: Double)

  /** Noise ingredient pool + constants. The pool is a BOUNDED keyed-stride
    * sample of the carrier column. The reference materializes one e per
    * corpus row (SCPW.py noise pool), but the pool is only a source of x
    * ingredients for e = kx·x + k1·u + k2 — a fixed-size sample of the same
    * column distribution preserves the scheme while capping driver memory at
    * 2^16 floats regardless of corpus size (a full-column collect would be
    * O(N) driver memory + an O(N) broadcast per embed call). Selection is
    * keyed (md5 of vec_id) so it is deterministic under any partitioning; the
    * orderBy+limit compiles to a distributed TakeOrdered, not a global sort.
    */
  def prepare(df: DataFrame, key: ScpwKey): ScpwPrep = {
    val spark = df.sparkSession
    import spark.implicits._
    val poolCap = 1 << 16
    val stride  = math.max(1L, df.count() / poolCap)
    def sample(strideN: Long) = df
      .filter(graft.functions.Md5ModExpr(
        concat_ws("#", col("vec_id"), lit("scpw-poolsel"), lit(key.seed)), strideN) === 0)
      .select(col("vec_id"), element_at(col("embedding"), key.position + 1).as("v"))
      .orderBy("vec_id").limit(poolCap)
      .as[(Long, Float)].collect()
    val picked  = sample(stride)
    val colVals = (if (picked.nonEmpty) picked else sample(1L)).sortBy(_._1).map(_._2)
    val (kx, k1, k2) = noiseParams(df, key)
    ScpwPrep(colVals, kx, k1, k2)
  }

  def embed(df: DataFrame, wm: String, strength: Double, key: ScpwKey,
            precomputedCarriers: Option[DataFrame] = None,
            prep: Option[ScpwPrep] = None): DataFrame = {
    val spark = df.sparkSession
    val carrierDf = precomputedCarriers.getOrElse(carriers(df, wm, strength, key))
    val p       = prep.getOrElse(prepare(df, key))
    val bcPool  = spark.sparkContext.broadcast(p.pool)
    val (kx, k1, k2) = (p.kx, p.k1, p.k2)
    val pos  = key.position
    val seed = key.seed

    val embedUdf = udf((vec: Array[Float], cid: String, wmBit: Int, vid: Long) => {
      val pool = bcPool.value
      val out  = vec.clone()
      var t    = 0
      var ok   = false
      while (!ok && t < 64) {
        val x = pool(Hashing.md5Mod(s"$vid|scpw-pool|$seed|$t", pool.length.toLong).toInt).toDouble
        val u = Hashing.gauss(s"$vid|scpw-g|$seed|$t")
        val e = kx * x + k1 * u + k2
        out(pos) = (out(pos).toDouble + e).toFloat // numpy float32 += semantics
        t += 1
        ok = hiddenBit(out, cid, pos) == wmBit
      }
      out
    })
    df.join(carrierDf, Seq("vec_id"), "left")
      .withColumn("embedding",
        when(col("wm_bit").isNotNull,
          embedUdf(col("embedding"), col("content_id"), col("wm_bit"), col("vec_id")))
        .otherwise(col("embedding")))
      .drop("wm_bit", "content_id")
  }

  /** Blind extraction (SCPW.py:231–252): regroup + majority vote. */
  def extract(df: DataFrame, l: Int, key: ScpwKey): DataFrame =
    Tvp.majorityVote(classify(df, l, key), l)
}
