package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level surface of the custom scalar functions.
  *
  * Everything that IS expressible with `org.apache.spark.sql.functions`
  * built-ins stays a built-in composition (codegen'd, prunable, oracle-
  * mirrorable). Only the four genuinely non-SQL primitives (the bit codec of
  * assistance.py / watermarking.py:53–117) are Scala UDFs over primitive
  * arrays — deterministic pure functions, marked `asNondeterministic` nowhere,
  * so Catalyst may still push/reorder around them.
  */
object GraftCols {

  /** md5 hex of the '#'-joined string forms of `cols` — the engine's keyed
    * random draw. Ordering rows by this column is the distributed replacement
    * for `random.sample` (watermarking.py:159): deterministic, uniform,
    * partition-independent, and reproducible in DuckDB (identical md5 hex).
    */
  def keyedHash(cols: Column*): Column = md5(concat_ws("#", cols: _*))

  /** Uniform [0,1) from a keyed draw — mirrors Hashing.unitUniform. */
  def keyedUnit(cols: Column*): Column =
    conv(substring(keyedHash(cols: _*), 1, 13), 16, 10).cast("double") / lit(4503599627370496.0)

  /** hash_re(s) % m (full 128-bit mod, watermarking.py:20–27) — a native
    * Catalyst expression (Md5ModExpr) with codegen.
    */
  val md5ModUdf = udf((s: String, m: Long) => Hashing.md5Mod(s, m))

  def md5Mod(c: Column, m: Int): Column = Md5ModExpr(c, m.toLong)

  /** Content-derived id over key dims (watermarking.py:39–50), built-ins only:
    * per dim `substr(cast(trunc(abs(v[dim]) * scale) as bigint), 1, 1)`.
    * `dims` are 0-based (reference indexing); element_at is 1-based.
    *
    * Above ~24 dims the inlined expression tree makes whole-stage codegen
    * methods exceed JVM limits inside aggregates (janino fails, Spark
    * retries the compile per stage then interprets — seconds of latency per
    * query); wide ids switch to the equivalent primitive UDF
    * (Bits.contentId — same truncation semantics, same strings).
    */
  def contentIdCol(vec: Column, dims: Seq[Int], scale: Double): Column =
    if (dims.length <= 24)
      concat(dims.map { d =>
        substring(
          floor(abs(element_at(vec, d + 1).cast("double")) * lit(scale)).cast("long").cast("string"),
          1, 1)
      }: _*)
    else ContentIdExpr(vec, dims.toArray, scale)

  // native Catalyst expressions (LsbExprs) — no UDF encoder round-trip
  def embedLsb(vec: Column, bit: Column, dims: Seq[Int], cid: Column): Column =
    LsbExprs.embedCol(vec, bit, cid, dims.toArray)

  def extractLsb(vec: Column, dims: Seq[Int], cid: Column): Column =
    LsbExprs.extractCol(vec, cid, dims.toArray)
}
