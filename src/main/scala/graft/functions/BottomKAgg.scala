package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: the k smallest DISTINCT longs of a group, as a sorted
  * array — the bottom-k sketch as a single aggregation pass.
  *
  * This is the alternative physical shape to Sketches.kmvDistinct's
  * window+WindowGroupLimit selection: state is a bounded sorted array
  * (≤ k longs per group per task), reduce is a binary-search bounded
  * insert, and merge is a sorted-merge-dedup-truncate — associative and
  * commutative, so Catalyst runs it as an ordinary partial/final aggregate
  * with NO sort and NO window: one exchange of ≤ k·tasks rows per group.
  * Prefer it when the aggregation is already grouping (one pass, one
  * shuffle); prefer the window form when the k survivors themselves are the
  * output and downstream wants rows.
  *
  * Duplicate inputs are dropped on insert (bottom-k of DISTINCT values is
  * what the KMV estimator needs), so callers can feed raw hashes without a
  * distinct pre-pass.
  *
  * Input contract: hashes must be NON-NULL. The typed Long encoder coerces
  * a null input column to 0L, which would count as a real minimum value;
  * kmvDistinct instead drops null hashes. Filter nulls before aggregating
  * (as kmvDistinct does) so the two paths agree on null-bearing columns.
  */
final class BottomKAgg(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 1, s"k=$k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, v)
    if (i >= 0) buf // already present
    else {
      val ins = -i - 1
      if (buf.length >= k && ins >= k) buf // too large to matter
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
