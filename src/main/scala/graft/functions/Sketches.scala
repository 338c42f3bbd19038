package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic distributed sketches. Both estimators here are md5-keyed
  * and integer-arithmetic end to end, so a SQL oracle replays them BIT-exactly
  * — unlike HLL/approx_count_distinct, whose register layouts are
  * engine-private. That determinism is not a toy property: it is what lets a
  * 100 TB pipeline assert sketch results across engine versions and what
  * lets the driver's DuckDB compare gate them like any exact query.
  *
  * KMV (k minimum values): the k smallest 48-bit hash values of a column's
  * DISTINCT values estimate the column's cardinality as (k−1)·2^48 / h_k
  * (Bar-Yossef et al., the classic bottom-k estimator; FAR less state than
  * exact distinct at high cardinality — k longs per group vs one entry per
  * value). Merge = "union then keep k smallest", associative and
  * order-invariant, so it distributes as plain aggregation.
  */
object Sketches {

  /** 48-bit md5 prefix as a long — uniform on [0, 2^48), collision-safe to
    * ~10^7 distinct values per group (beyond that, collisions bias the
    * estimate low by < k/2^48 — negligible), and exactly representable on
    * every engine (2^48 < 2^53, though the math below stays integer anyway).
    */
  def hash48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** Per-`group` distinct-count estimate of `value` from a bottom-k sketch.
    *
    * Output: (groupCols*, n_kept, est_distinct) — when a group holds fewer
    * than k distinct hashes the estimate IS the exact count (the sketch is
    * lossless below k); at or above k it is the integer-division estimator
    * (k−1)·2^48 div h_k.
    *
    * Plan shape at scale: the `row_number() <= k` filter triggers Catalyst's
    * InferWindowGroupLimit rewrite (Spark 3.5+), which inserts a
    * WindowGroupLimit in PARTIAL mode below the window's exchange — every
    * map task pre-prunes its slice of a group to its k smallest hashes
    * before any shuffle, so the group's sort task receives at most
    * k·(upstream tasks) rows, never the group's full distinct set. That
    * partial/final pair IS the distributed bottom-k merge; SketchSpec and
    * PlanSpec gate its presence so a regression (e.g. rewriting the filter
    * in a form the rule no longer recognizes) reintroduces the single-task
    * group sort loudly.
    */
  /** Count-min sketch over a pre-aggregated (key, count) frame: d hash rows
    * × w buckets, cell = sum of counts of the keys hashing there. The whole
    * sketch is d·w rows — CONSTANT state regardless of key cardinality,
    * which is its point at 100 TB: a frequency oracle for a billion-token
    * vocabulary in a frame that broadcasts. Estimates only ever
    * overestimate (collisions add, never subtract): est(k) = min over the d
    * rows of the cell k hashes to, within ε·N of truth with probability
    * 1−δ at w = e/ε, d = ln(1/δ) (Cormode & Muthukrishnan). Hashing is the
    * engine's keyed md5-mod, so a SQL oracle replays every cell and every
    * estimate bit-exactly.
    *
    * Build cost: one map-side-combined groupBy over d×|keys| rows. At
    * extreme vocabularies, pre-aggregate the input counts first (as the
    * caller is required to) so the explode multiplies group rows, not raw
    * tokens.
    */
  def cmsBuild(counts: DataFrame, key: String, cnt: String,
               d: Int = 4, w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 2, s"degenerate sketch ${d}x$w")
    counts
      .select(explode(sequence(lit(0), lit(d - 1))).as("__j"),
        col(key), col(cnt))
      .select(col("__j"),
        GraftCols.md5Mod(
          concat(col("__j").cast("string"), lit("#"), col(key)), w).as("__b"),
        col(cnt))
      .groupBy("__j", "__b").agg(sum(col(cnt)).as("__c"))
  }

  /** Point estimates for `probes`' keys against a cmsBuild sketch (same d,
    * w, and key expression): (key, n_cms). The sketch side broadcasts —
    * d·w rows by construction.
    */
  def cmsProbe(cms: DataFrame, probes: DataFrame, key: String,
               d: Int = 4, w: Int = 1024): DataFrame =
    probes
      .select(col(key), explode(sequence(lit(0), lit(d - 1))).as("__j"))
      .withColumn("__b", GraftCols.md5Mod(
        concat(col("__j").cast("string"), lit("#"), col(key)), w))
      // LEFT join: a probe key absent from the build (empty cells) must
      // estimate 0, not silently vanish from the output — an inner join is
      // only safe when probes come from the build itself.
      .join(broadcast(cms), Seq("__j", "__b"), "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
      .groupBy(key).agg(min("__c").as("n_cms"))

  /** Bloom filter AS DATA: an m-bit membership filter materialized as
    * ≤ m/64 (word, bits) rows — persistable to parquet, broadcastable,
    * mergeable by `bit_or` over word, and md5-keyed so a SQL oracle replays
    * every bit. This is the engine-PORTABLE complement to
    * InjectRuntimeFilter's in-plan Bloom (q_bloom_join): that one lives and
    * dies inside a single query's physical plan; this one is a table — build
    * it once from a dim's keys, persist it next to the data, and any later
    * job (or any other engine) pre-filters its fact side before the real
    * join. Semi-join reduction with the filter as a first-class artifact.
    *
    * d hash probes per key via the keyed md5-mod (positions j#key mod m).
    * False-positive rate ≈ (1 − e^(−d·n/m))^d — size m ≈ 10·n bits for ~1%
    * at d = 3. No false negatives, ever (spec-pinned): a miss is PROOF of
    * absence, which is what makes the pre-filter row-set-safe — the exact
    * join afterwards only removes false positives.
    */
  def bloomBuild(keys: DataFrame, key: String, mBits: Int = 4096,
                 d: Int = 3): DataFrame = {
    require(mBits >= 63, s"mBits=$mBits")
    require(d >= 1, s"d=$d")
    // 63 bits per word — the sign bit stays clear so every mask, word, and
    // bit_count is identical in engines that error on 1<<63 (DuckDB) and
    // engines that wrap it (the JVM). The format is ours; 1/64 of the
    // packing density is the price of bit-exact portability.
    keys
      .select(explode(sequence(lit(0), lit(d - 1))).as("__j"), col(key))
      .select(GraftCols.md5Mod(
        concat(col("__j").cast("string"), lit("#"), col(key)), mBits).as("__pos"))
      .distinct()
      .select(expr("__pos div 63").as("__word"),
        expr("shiftleft(cast(1 as bigint), cast(pmod(__pos, 63) as int))")
          .as("__mask"))
      .groupBy("__word").agg(expr("bit_or(__mask)").as("__bits"))
  }

  /** Membership verdicts for `probes`' DISTINCT keys against a bloomBuild
    * filter (same key expression, m, d): (key, might_contain ∈ {0, 1}).
    * The filter side broadcasts — ≤ m/64 rows by construction. A key is a
    * candidate iff ALL d probed bits are set; absent words count as zero
    * bits (the left join + coalesce, same discipline as cmsProbe).
    */
  def bloomMightContain(bloom: DataFrame, probes: DataFrame, key: String,
                        mBits: Int = 4096, d: Int = 3): DataFrame =
    probes.select(col(key)).distinct()
      .select(col(key), explode(sequence(lit(0), lit(d - 1))).as("__j"))
      .withColumn("__pos", GraftCols.md5Mod(
        concat(col("__j").cast("string"), lit("#"), col(key)), mBits))
      .withColumn("__word", expr("__pos div 63"))
      .withColumn("__mask",
        expr("shiftleft(cast(1 as bigint), cast(pmod(__pos, 63) as int))"))
      .join(broadcast(bloom), Seq("__word"), "left")
      .withColumn("__hit",
        when(coalesce(col("__bits"), lit(0L)).bitwiseAND(col("__mask")) =!= 0L, 1L)
          .otherwise(0L))
      .groupBy(key).agg(min(col("__hit")).as("might_contain"))

  /** Per-`group` quantile estimates of a CONTINUOUS `value` from a
    * deterministic bottom-k ROW sample — the quantile analog of the KMV
    * work, for the domain where the exact-histogram trick is wrong
    * (|distinct values| ≈ |rows|, so the histogram IS the data).
    *
    * The k rows with the smallest 48-bit md5 hashes of `rowKey` (a
    * row-unique key) are a uniform without-replacement sample of the group,
    * chosen by value-independent coin flips — deterministic, mergeable
    * ("union then keep k smallest", the same partial/final WindowGroupLimit
    * prune kmvDistinct rides), and replayable bit-exactly in SQL. The
    * q-quantile estimate is the sample's order statistic at rank
    * `max(1, ceil(q·m))` (m = kept rows, integer per-mille math — no float
    * rank arithmetic to diverge between engines); when the group holds ≤ k
    * rows the sample is the group and the estimate is EXACT.
    *
    * Error bound (DKW inequality): P(any quantile's true rank off by more
    * than ε·n) ≤ 2·exp(−2kε²) — k = 256 gives ε ≈ 0.1 at 98% confidence,
    * INDEPENDENT of group size; SketchSpec pins the bound empirically.
    * State per group is k (value, hash) pairs, ever.
    *
    * Output: (groupCols*, q_pm, n_sample, est_value_micros) — one row per
    * group × requested per-mille quantile; the estimate is an actual sample
    * value in exact integer micros (never an interpolation, so it survives
    * every read path).
    */
  def quantileSketch(df: DataFrame, groupCols: Seq[String], value: Column,
                     rowKey: Column, k: Int = 256,
                     qsPerMille: Seq[Int] = Seq(100, 500, 900, 990)): DataFrame = {
    require(k >= 1, s"k=$k")
    require(qsPerMille.nonEmpty && qsPerMille.forall(q => q >= 1 && q <= 1000),
      s"per-mille quantiles must be in [1, 1000]: $qsPerMille")
    val g = groupCols.map(col)
    val hashed = df
      .select(g :+ value.as("__v") :+ hash48(rowKey).as("__hv"): _*)
      .filter(col("__hv").isNotNull && col("__v").isNotNull)
    val sel = Window.partitionBy(g: _*).orderBy(col("__hv"), col("__v"))
    val sample = hashed
      .withColumn("__rk", row_number().over(sel)).filter(col("__rk") <= k)
    val ranked = sample
      .withColumn("__rn",
        row_number().over(Window.partitionBy(g: _*).orderBy(col("__v"), col("__hv"))))
      .withColumn("__m", count(lit(1)).over(Window.partitionBy(g: _*)))
    ranked
      .withColumn("q_pm", explode(array(qsPerMille.map(lit(_)): _*)))
      .filter(col("__rn") ===
        greatest(lit(1L), expr("(cast(q_pm as bigint) * __m + 999) div 1000")))
      .select(g ++ Seq(col("q_pm"), col("__m").as("n_sample"),
        floor(col("__v").cast("double") * lit(1000000.0) + lit(0.5))
          .as("est_value_micros")): _*)
  }

  def kmvDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
                  k: Int = 64): DataFrame = {
    require(k >= 2, s"k=$k: the bottom-k estimator needs k >= 2")
    val g = groupCols.map(col)
    // Null values hash to a null __hv, which would sort FIRST under the
    // ascending window and occupy rank 1 — biasing n_kept/est_distinct and
    // silently diverging from the typed BottomKAgg path (which has a
    // non-null input contract, see BottomKAgg's scaladoc). NULL is not a
    // distinct value to either estimator: drop it here.
    val hashed = df.select(g :+ hash48(value).as("__hv"): _*)
      .filter(col("__hv").isNotNull).distinct()
    val global = Window.partitionBy(g: _*).orderBy("__hv")
    hashed
      .withColumn("__rk", row_number().over(global)).filter(col("__rk") <= k)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("__rk") === k, col("__hv"))).as("__hk"))
      .select(g ++ Seq(col("n_kept"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${k - 1}L * 281474976710656L) div __hk"))
          .as("est_distinct")): _*)
  }
}
