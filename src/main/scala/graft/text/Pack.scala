package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (concatenate-then-chunk): per source, docs in doc_id
  * order are packed into fixed-size token context windows; a doc is assigned
  * to the window holding its LAST token. The running token total is the only
  * non-map step, and it is the classic window-partition trap: partitioned by
  * `source` alone it has exactly |sources| partitions at ANY corpus size — a
  * web crawl is typically ONE source, so at 100 TB that window is a
  * single-task global sort + sequential scan. The cumulative sum here is
  * therefore DUAL-REGIME, the same shape as `Tvp.groupedRank`: a plain
  * per-source window below `graft.rank.smallMaxRows` (fixture scale — the
  * bucket machinery costs more than the single-task sort it avoids), and a
  * (source × order-consistent doc_id-range bucket) partial cumsum plus
  * cumulative histogram offsets above it — row-identical (PackSpec gates
  * parity), with sort parallelism multiplied by the bucket count.
  */
object Pack {

  /** The shared dual-regime knob (`graft.rank.smallMaxRows`) — one control
    * surface for every dual-regime rank/cumsum in the engine; tests force
    * either path with it.
    */
  private def smallMax(df: DataFrame): Long =
    graft.watermark.Tvp.smallRankMax(df.sparkSession)

  /** Per-`parts` running sum of `valCol` in `orderCol` ASC order, without a
    * per-part global sort: partial cumsum within (parts, bucket) partitions
    * plus the bucket's cumulative offset from one histogram aggregate.
    * `bucket` must be ORDER-CONSISTENT — b(x) < b(y) implies x precedes y in
    * `orderCol` order — so (bucket asc, orderCol) is exactly orderCol order
    * and the result is row-identical to `sum(valCol) over (partition by
    * parts order by orderCol)`. The offsets frame is |parts|·|buckets| rows,
    * joined back broadcast when that product is small (the common case) and
    * as a plain keyed equi-join when a many-source corpus makes it large —
    * `broadcastOffsets` picks; either join is on (parts, bucket) and
    * row-identical.
    *
    * With `distributed = false` this IS the plain per-part window.
    */
  private[graft] def groupedCumSum(df: DataFrame, parts: Seq[String],
      orderCol: String, valCol: String, cumName: String,
      bucket: Column, distributed: Boolean,
      broadcastOffsets: Boolean = true): DataFrame = {
    if (!distributed)
      return df.withColumn(cumName, sum(col(valCol)).over(
        Window.partitionBy(parts.map(col): _*).orderBy(col(orderCol))))
    val b = s"__b_$cumName"; val off = s"__off_$cumName"; val c = s"__c_$cumName"
    val withB = df.withColumn(b, bucket)
    val offs = withB.groupBy((parts :+ b).map(col): _*)
      .agg(sum(col(valCol)).as(c))
      .withColumn(off, coalesce(sum(col(c)).over(
        Window.partitionBy(parts.map(col): _*).orderBy(col(b))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((parts :+ b :+ off).map(col): _*)
    withB.join(if (broadcastOffsets) broadcast(offs) else offs, parts :+ b)
      .withColumn(cumName, sum(col(valCol)).over(
          Window.partitionBy((parts :+ b).map(col): _*).orderBy(col(orderCol)))
        + col(off))
      .drop(b, off)
  }

  /** The pack_sequences frame: (source, window_id, n_docs, n_tokens,
    * first_doc, last_doc), window_id = (cum − 1) div contextLen. One bounded
    * 1-row stats collect (count + doc_id bounds — column-pruned, near
    * metadata-only on parquet) picks the regime and the bucket range; the
    * bucket is 65536 range slices of [mn, mx], order-consistent because
    * long→double conversion and the affine map are monotone.
    */
  def packWindows(docs: DataFrame, contextLen: Int = 2048): DataFrame = {
    val t = docs.select(col("source"), col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("tk"))
    val st = t.agg(count(lit(1)).as("n"),
      min("doc_id").as("mn"), max("doc_id").as("mx"),
      countDistinct(col("source")).as("ns")).head()
    val n  = st.getLong(0)
    val nSources = if (n == 0L) 0L else st.getLong(3)
    // The offsets frame is |sources|·|buckets| rows. The bucket machinery
    // stays ON for ANY source count above the row knob — a many-source
    // corpus does not guarantee many-way sort parallelism (one crawl source
    // can hold most of the rows, and that source's cumsum would be one
    // task), so a skewed source must still split across buckets. The bucket
    // count scales down with the source count (floor 8 — enough splits to
    // break a single-source monolith) which bounds the offsets frame at
    // ~max(65536, 8·|sources|) rows; it rides back broadcast while under
    // ~256k rows and as a plain keyed join beyond that (a broadcast of
    // 8·10⁶ offset rows for a 10⁶-source corpus would defeat the point).
    // Bucket count never changes results — only how the row-identical
    // cumsum parallelizes.
    val big = n > smallMax(docs)
    val nBuckets =
      if (nSources <= 1L) 65536L
      else math.max(8L, math.min(65536L, 65536L / nSources))
    val bcastOffs = nSources * nBuckets <= 262144L
    val (mn, mx) = if (n == 0L) (0L, 0L) else (st.getLong(1), st.getLong(2))
    val bucket =
      if (!big || mx == mn) lit(0)
      else least(greatest(
        floor((col("doc_id").cast("double") - mn) / (mx - mn).toDouble * (nBuckets - 1L))
          .cast("int"), lit(0)), lit((nBuckets - 1L).toInt))
    groupedCumSum(t, Seq("source"), "doc_id", "tk", "cum", bucket,
        distributed = big, broadcastOffsets = bcastOffs)
      .withColumn("window_id", expr(s"(cum - 1) div $contextLen"))
      .groupBy("source", "window_id")
      .agg(count(lit(1)).as("n_docs"), sum("tk").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }
}
