package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each fact row picks up the LATEST dim row with the
  * same key and `dim.time <= fact.time` (inclusive) — the join time-series
  * engines ship natively (DuckDB `ASOF JOIN`, kdb `aj`, pandas `merge_asof`)
  * and Spark lacks.
  *
  * The naive formulation — a non-equi theta join on `(key, dim.t <= fact.t)`
  * plus a per-fact argmax — plans as a broadcast-nested-loop or cartesian in
  * Spark and does |fact|·|dim-per-key| work. This implementation is the
  * single-shuffle union form instead:
  *
  *   1. tag dim rows 0 and fact rows 1, pad each side with the other's
  *      columns as typed nulls, union by name;
  *   2. one hash exchange on `key`, in-partition sort by `(time, tag)`;
  *   3. a running `last(dim col, ignoreNulls)` window carries the most
  *      recent dim values forward onto every subsequent row;
  *   4. keep the fact rows.
  *
  * Cost is ONE shuffle of |fact| + |dim| rows and a per-key sort — the same
  * exchange a plain equi-join would pay — regardless of how many dim rows
  * precede each fact row. Sorting `(time, tag)` with dim < fact makes the
  * equal-timestamp case inclusive, matching DuckDB's `>=` semantics, which
  * is what lets the driver's oracle replay a query on this operator as a
  * literal `ASOF JOIN`.
  *
  * Scale shape at 100 TB: the exchange partitions by key alone, so a single
  * key whose history exceeds one task is the failure mode (same as any
  * windowed cumsum). The remedy is the range-partitioned two-pass carry
  * (partition by (key, time-slice), compute per-slice tails, broadcast the
  * per-slice carry-in — the `Pack.packWindows` construction); keys in the
  * fixture domain (user_id) are orders of magnitude below that bar, so this
  * operator stays the simple form and the packing module documents the
  * two-pass variant.
  *
  * Ties inside `dim` (two dim rows, same key, same time) make "latest"
  * ambiguous in every engine — callers must pre-aggregate dim to one row
  * per (key, time), which also keeps the running-`last` deterministic.
  */
object AsOfJoin {

  /** `fact ⋈asof dim` on `key`, backward-inclusive over long column `time`.
    *
    * `dimCols` are the dim attributes to carry (must not collide with fact
    * column names; rename before the call). A fact row with no qualifying
    * dim row keeps nulls in `dimCols` — i.e. LEFT ASOF semantics. Dim
    * attribute values must be non-null: the running `last(_, ignoreNulls)`
    * cannot distinguish "dim row carried a null" from "no dim row yet"
    * (encode known-missing as a sentinel upstream).
    */
  def backward(fact: DataFrame, dim: DataFrame, key: String, time: String,
               dimCols: Seq[String]): DataFrame =
    joinImpl(fact, dim, key, time, dimCols, forward = false)

  /** Forward as-of: each fact row picks up the EARLIEST dim row with the
    * same key and `dim.time >= fact.time` (inclusive) — "next event after"
    * semantics (time-to-next-purchase funnels, next-maintenance-window
    * lookups). Same single-exchange union form as `backward`, with the
    * running `last` over preceding rows replaced by a running `first` over
    * following rows; fact sorts before dim at equal timestamps so the tie
    * stays inclusive. Same cost, same skew caveat, same dim-tie
    * pre-aggregation requirement.
    */
  def forward(fact: DataFrame, dim: DataFrame, key: String, time: String,
              dimCols: Seq[String]): DataFrame =
    joinImpl(fact, dim, key, time, dimCols, forward = true)

  /** Skew-safe backward as-of: identical semantics to `backward`, but the
    * running window partitions by `(key, time div bucketWidth)` instead of
    * the key alone, so a key whose history exceeds one task splits across
    * time-slice buckets — the failure mode `backward` documents, closed.
    * A second pass over BUCKET TAILS (one row per non-empty (key, bucket)
    * of the dim side — thousands of rows where the data had billions)
    * computes each bucket's carry-in: the latest dim values from any
    * earlier bucket. Final value = within-bucket running last, else the
    * carry-in. Cost: the same single big exchange (now on (key, bucket)),
    * plus a per-key window over the tiny tail frame and a co-partitioned
    * carry join. Choose bucketWidth so a hot key's rows per bucket fit a
    * task; AsOfJoinSpec pins parity with `backward` across widths,
    * including degenerate ones.
    */
  def backwardBucketed(fact: DataFrame, dim: DataFrame, key: String,
                       time: String, dimCols: Seq[String],
                       bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    require(dimCols.nonEmpty, "as-of join with no dim columns is a no-op")
    val factCols = fact.columns.filterNot(_ == key).filterNot(_ == time)
    require(factCols.intersect(dimCols).isEmpty,
      s"dim columns ${dimCols.intersect(factCols).mkString(",")} collide with fact columns")
    for (reserved <- Seq("__tag", "__bkt"))
      require(!fact.columns.contains(reserved) && !dim.columns.contains(reserved),
        s"column $reserved is reserved by the as-of join's working frame")
    val dimTyped = dim.schema.fields.map(f => f.name -> f.dataType).toMap
    val factTyped = fact.schema.fields.map(f => f.name -> f.dataType).toMap
    val bkt = RangeJoin.floorDivCol(col(time), bucketWidth).as("__bkt")

    val dimSide = dim.select(
      col(key) +: col(time) +: bkt +: lit(0).as("__tag") +:
        (dimCols.map(col) ++
          factCols.map(c => lit(null).cast(factTyped(c)).as(c))): _*)
    val factSide = fact.select(
      col(key) +: col(time) +: bkt +: lit(1).as("__tag") +:
        (dimCols.map(c => lit(null).cast(dimTyped(c)).as(c)) ++
          factCols.map(col)): _*)

    // pass 1: running last WITHIN each (key, bucket) slice
    val w = Window.partitionBy(col(key), col("__bkt"))
      .orderBy(col(time), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = dimSide.unionByName(factSide)
      .select(
        col(key) +: col(time) +: col("__bkt") +: col("__tag") +:
          (dimCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) ++
            factCols.map(col)): _*)

    // pass 2: per-bucket dim tails (latest dim values inside each bucket) —
    // max of a (time, value) struct picks the latest row's value, well-
    // defined because callers pre-aggregate dim to one row per (key, time)
    val tailAgg = dimSide.groupBy(col(key), col("__bkt"))
      .agg(max(struct(col(time) +: dimCols.map(col): _*)).as("__t"))
      .select(col(key) +: col("__bkt") +:
        dimCols.map(c => col("__t").getField(c).as(s"__tail_$c")): _*)

    // carry-in per bucket = latest tail among STRICTLY EARLIER buckets; the
    // bucket spine is every bucket either side touches, so fact-only
    // buckets still receive their carry
    val spine = dimSide.select(col(key), col("__bkt"))
      .union(factSide.select(col(key), col("__bkt"))).distinct()
    val cw = Window.partitionBy(key).orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine.join(tailAgg, Seq(key, "__bkt"), "left")
      .select(col(key) +: col("__bkt") +:
        dimCols.map(c =>
          last(col(s"__tail_$c"), ignoreNulls = true).over(cw).as(s"__in_$c")): _*)

    within.join(carry, Seq(key, "__bkt"))
      .select(
        col(key) +: col(time) +: col("__tag") +:
          (dimCols.map(c => coalesce(col(c), col(s"__in_$c")).as(c)) ++
            factCols.map(col)): _*)
      .filter(col("__tag") === 1).drop("__tag")
  }

  private def joinImpl(fact: DataFrame, dim: DataFrame, key: String,
                       time: String, dimCols: Seq[String],
                       forward: Boolean): DataFrame = {
    require(dimCols.nonEmpty, "as-of join with no dim columns is a no-op")
    val factCols = fact.columns.filterNot(_ == key).filterNot(_ == time)
    require(factCols.intersect(dimCols).isEmpty,
      s"dim columns ${dimCols.intersect(factCols).mkString(",")} collide with fact columns")
    require(!fact.columns.contains("__tag") && !dim.columns.contains("__tag"),
      "column __tag is reserved by the as-of join's working frame")

    val dimTyped = dim.schema.fields.map(f => f.name -> f.dataType).toMap
    val factTyped = fact.schema.fields.map(f => f.name -> f.dataType).toMap

    // tag ordering makes the equal-timestamp case inclusive in both
    // directions: backward wants dim BEFORE fact in the ascending sort,
    // forward wants fact before dim
    val (dimTag, factTag) = if (forward) (1, 0) else (0, 1)
    val dimSide = dim.select(
      col(key) +: col(time) +: lit(dimTag).as("__tag") +:
        (dimCols.map(col) ++
          factCols.map(c => lit(null).cast(factTyped(c)).as(c))): _*)
    val factSide = fact.select(
      col(key) +: col(time) +: lit(factTag).as("__tag") +:
        (dimCols.map(c => lit(null).cast(dimTyped(c)).as(c)) ++
          factCols.map(col)): _*)

    val base = Window.partitionBy(key).orderBy(col(time), col("__tag"))
    val (w, pick) =
      if (forward)
        (base.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          (c: String) => first(col(c), ignoreNulls = true))
      else
        (base.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          (c: String) => last(col(c), ignoreNulls = true))
    val carried = dimSide.unionByName(factSide)
      .select(
        col(key) +: col(time) +: col("__tag") +:
          (dimCols.map(c => pick(c).over(w).as(c)) ++
            factCols.map(col)): _*)
    carried.filter(col("__tag") === factTag).drop("__tag")
  }
}
