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
