package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted equi-join: the standard remedy for a shuffle join whose key
  * distribution concentrates most rows on a handful of values, where hash
  * partitioning funnels every hot-key row through one task. Heavy keys are
  * split across `nSalt` sub-keys on the big (fact) side and the small (dim)
  * side replicates its heavy-key rows once per sub-key, so the join runs on
  * `(key, salt)` and the hot key's rows spread over `nSalt` tasks. The output
  * row set is IDENTICAL to the plain join — salting only changes the shuffle
  * layout — which is what lets the driver's oracle replay the query as the
  * unsalted SQL join.
  *
  * Scope notes, because salting is NOT the first tool to reach for:
  *   - a dim small enough to broadcast needs no salting (no fact shuffle at
  *     all) — salt only when the dim side is too big to broadcast;
  *   - AQE's skew-join handling already splits oversized SORT-MERGE
  *     partitions at runtime, but only for the join patterns it recognizes;
  *     explicit salting also covers shuffle-hash joins, bucketed tables
  *     (where AQE must not break the bucket contract), and downstream
  *     aggregations keyed on the salted column.
  *
  * Heavy-key detection is a full census — `fact.groupBy(key).count()` is one
  * map-side-combine shuffle of |distinct keys| rows, cheap at any corpus
  * size — with an ABSOLUTE row threshold (callers size it to their target
  * rows-per-task) and a hard `maxHeavy` bound on the driver-collected heavy
  * set. At extreme key cardinality swap the census for a keyed-hash sample
  * (any key holding share ≥ f of a sample caps the candidate count at 1/f);
  * the join construction below is unchanged.
  */
object SkewJoin {

  /** Distinct `key` values holding at least `heavyThreshold` fact rows.
    * Driver-bounded: throws if more than `maxHeavy` qualify (a threshold
    * that low means the key column simply has no skew worth salting).
    */
  def heavyKeys(fact: DataFrame, key: String, heavyThreshold: Long,
                maxHeavy: Int = 1024): Seq[Any] = {
    val rows = fact.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= heavyThreshold)
      .select(col(key))
      .take(maxHeavy + 1)
    require(rows.length <= maxHeavy,
      s"more than $maxHeavy keys exceed $heavyThreshold rows — raise the " +
        "threshold (near-uniform keys do not need salting)")
    rows.toSeq.map(_.get(0))
  }

  /** Sampled heavy-key census for EXTREME key cardinality — the regime where
    * `heavyKeys`' full census (one shuffle of |distinct keys| rows) stops
    * being cheap because |distinct keys| ≈ |rows|. Rows whose 48-bit
    * md5(rowKey) falls below `sampleRate`·2^48 form a deterministic uniform
    * sample (value-independent coin flips — the same keyed-hash device as
    * the sketches, so reruns and retries see the same sample); the census
    * then runs over the sample alone, shuffling ~`sampleRate`·N rows
    * regardless of key cardinality.
    *
    * The threshold is a SHARE, not an absolute count (at unknown scale a
    * row threshold means nothing): returns keys holding at least
    * `minShare`·`safety` of the SAMPLE's rows. Pigeonhole caps the
    * candidates at 1/(minShare·safety) before any data is seen, so the
    * driver collect is bounded by construction. `safety` < 1 guards false
    * NEGATIVES — a key with true share ≥ minShare misses only if its sample
    * share dips below minShare·safety, probability ≤ exp(−s·minShare·(1−safety)²/2)
    * (Chernoff; s = sample rows — at s = 10⁴, f = 5%, safety = ½ that is
    * e^−62). False positives are harmless: an extra heavy key only
    * replicates a few more dim rows in `innerSalted`.
    *
    * Size `sampleRate` so s ≈ rate·N lands in 10⁴–10⁶: enough for the
    * Chernoff bound, small enough that the census shuffle is noise.
    */
  def heavyKeysSampled(fact: DataFrame, key: String, rowKey: Column,
                       minShare: Double, sampleRate: Double,
                       safety: Double = 0.5, maxHeavy: Int = 1024): Seq[Any] = {
    require(minShare > 0.0 && minShare <= 1.0, s"minShare=$minShare")
    require(sampleRate > 0.0 && sampleRate <= 1.0, s"sampleRate=$sampleRate")
    require(safety > 0.0 && safety <= 1.0, s"safety=$safety")
    val bound = math.ceil(sampleRate * 281474976710656.0).toLong // 2^48
    val census = fact
      .filter(graft.functions.Sketches.hash48(rowKey) < bound)
      .groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .persist() // two tiny reads (total + filter) of one sample-sized frame
    try {
      val total = census.agg(coalesce(sum("__cnt"), lit(0L)))
        .first().getLong(0)
      if (total == 0L) Seq.empty
      else {
        val cutoff = math.max(1L, math.ceil(total * minShare * safety).toLong)
        val rows = census.filter(col("__cnt") >= cutoff)
          .select(col(key)).take(maxHeavy + 1)
        require(rows.length <= maxHeavy,
          s"more than $maxHeavy sampled keys exceed share ${minShare * safety} " +
            "— raise minShare (near-uniform keys do not need salting)")
        rows.toSeq.map(_.get(0))
      }
    } finally census.unpersist()
  }

  /** Inner equi-join `fact ⋈ dim` on `key` with heavy fact keys salted.
    *
    * `saltBy` must be a row-unique (or near-unique) fact column — the salt is
    * `hash(saltBy) mod nSalt`, deterministic per row so retries and AQE
    * re-plans land rows on the same sub-key. Light keys keep salt 0 and the
    * dim carries exactly one salt-0 copy of them, so only heavy-key dim rows
    * replicate. With no heavy keys the plain join is returned unchanged.
    *
    * `modelBigDim = true` pins the merge-join regime via a `shuffle_merge`
    * hint — the regime salting exists for. At fixture scale a tiny dim would
    * otherwise auto-broadcast and the demonstration would measure nothing;
    * in production the dim that needs salting is over the broadcast
    * threshold and the hint is a no-op statement of intent.
    */
  def innerSalted(fact: DataFrame, dim: DataFrame, key: String, saltBy: Column,
                  nSalt: Int, heavyThreshold: Long, maxHeavy: Int = 1024,
                  modelBigDim: Boolean = true): DataFrame = {
    require(nSalt >= 2, s"nSalt=$nSalt: salting needs at least 2 sub-keys")
    val heavy = heavyKeys(fact, key, heavyThreshold, maxHeavy)
    val dimSide = if (modelBigDim) dim.hint("shuffle_merge") else dim
    if (heavy.isEmpty) return fact.join(dimSide, key)
    val isHeavy = col(key).isInCollection(heavy)
    val factS = fact.withColumn("__salt",
      when(isHeavy, pmod(hash(saltBy), lit(nSalt))).otherwise(lit(0)))
    val dimS = dimSide.withColumn("__salt",
      explode(when(isHeavy, sequence(lit(0), lit(nSalt - 1)))
        .otherwise(array(lit(0)))))
    factS.join(dimS, Seq(key, "__salt")).drop("__salt")
  }
}
