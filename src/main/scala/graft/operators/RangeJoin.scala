package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: fact rows with a long point column matched to the
  * intervals `[start, end)` that contain them. Spark plans the naive theta
  * join (`i.start <= f.t AND f.t < i.end`) as a broadcast-nested-loop — every
  * fact row probed against every interval, |fact|·|intervals| work that a
  * 100 TB fact table cannot survive even with a small interval side.
  *
  * The standard fix (the published range-join optimization in Databricks
  * runtime and the bin strategy in GeoSpark/Sedona) turns it into an
  * EQUI-join on a bin key: choose a width W, a point lands in exactly one
  * bin `t div W`, an interval replicates to the `(len div W) + 1 (or 2)`
  * bins it overlaps, join on bin, then filter exact containment. Each
  * qualifying pair meets in exactly one bin — the point's — so the join
  * output needs no dedup, and Catalyst gets a hash-joinable key with all
  * its machinery (broadcast if small, shuffle-hash/SMJ + AQE skew handling
  * if not).
  *
  * Choosing W: replication per interval is `~len/W + 1` and candidate
  * selectivity within a bin is `~(len+W)/W` intervals per point — W near
  * the TYPICAL interval length keeps both O(1). A heavy tail of long
  * intervals shows up as bin-key skew on the interval side (bounded: one
  * row per covered bin), not as a blowup of the fact side.
  */
object RangeJoin {

  /** Floor division of a long column by a positive constant — exact for the
    * full long range (`div` truncates toward zero, wrong for negatives;
    * doubles lose precision above 2^53). Decimal is exact and codegen'd.
    */
  def floorDivCol(c: Column, w: Long): Column =
    floor(c.cast("decimal(38,0)") / lit(w)).cast("long")

  /** Join `fact` (point column `time`) to `intervals` (`[start, end)`,
    * end-exclusive, long columns) via bin-bucketed equi-join on width
    * `binWidth`, plus optional extra equi-`keys` present on both sides.
    * Empty intervals (`end <= start`) match nothing and are dropped (they
    * would otherwise make the bin `sequence()` run backwards). Output =
    * all (fact ⋈ interval) containment pairs, both sides' columns.
    */
  def pointInInterval(fact: DataFrame, intervals: DataFrame, time: String,
                      start: String, end: String, binWidth: Long,
                      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth must be positive")
    val overlap = fact.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns ${overlap.mkString(",")} exist on both sides — rename first")
    val factB = fact.withColumn("__bin", floorDivCol(col(time), binWidth))
    val intB = intervals.filter(col(end) > col(start))
      .withColumn("__bin", explode(sequence(
        floorDivCol(col(start), binWidth),
        floorDivCol(col(end) - lit(1L), binWidth))))
    factB.join(intB, (keys :+ "__bin").toSeq)
      .filter(col(time) >= col(start) && col(time) < col(end))
      .drop("__bin")
  }

  /** Interval-overlap join: `left` intervals `[lStart, lEnd)` matched to the
    * `right` intervals `[rStart, rEnd)` they overlap (both end-exclusive,
    * long columns) — sessions × incident windows, ad exposures × conversion
    * windows. Same bin strategy as `pointInInterval`, with both sides
    * replicated to their covered bins; a qualifying pair shares every bin
    * their intersection covers, so the join keeps only the bin of
    * `max(lStart, rStart)` — overlap means `max(start) < min(end)`, so that
    * bin is covered by BOTH intervals and the pair meets in exactly one
    * bin: dedup-free by construction, no distinct pass over the output.
    * Empty intervals match nothing and are dropped. Output = all
    * overlapping (left ⋈ right) pairs, both sides' columns.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String, binWidth: Long,
                      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth must be positive")
    val overlapCols = left.columns.toSet
      .intersect(right.columns.toSet) -- keys
    require(overlapCols.isEmpty,
      s"non-key columns ${overlapCols.mkString(",")} exist on both sides — rename first")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "column __bin is reserved by the range join's working frame")
    def binned(df: DataFrame, start: String, end: String) =
      df.filter(col(end) > col(start))
        .withColumn("__bin", explode(sequence(
          floorDivCol(col(start), binWidth),
          floorDivCol(col(end) - lit(1L), binWidth))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd),
        (keys :+ "__bin").toSeq)
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bin") ===
        floorDivCol(greatest(col(lStart), col(rStart)), binWidth))
      .drop("__bin")
  }
}
