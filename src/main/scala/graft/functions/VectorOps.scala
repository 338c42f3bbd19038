package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math, twice: primitive-array versions for the mapPartitions
  * hot path (kNN), and Column versions built purely from
  * `org.apache.spark.sql.functions` higher-order functions so Catalyst
  * codegens them and the DuckDB oracle can mirror them.
  * Reference distance semantics: `np.linalg.norm(a - b)` (watermarking.py:198).
  */
object VectorOps {

  def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) - b(i)).toDouble; s += d * d; i += 1 }
    s
  }

  def l2(a: Array[Float], b: Array[Float]): Double = math.sqrt(sqDist(a, b))

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  // ---- Column forms (codegen'd, no UDF) ----

  /** sqrt(sum((a_i - b_i)^2)) in double. */
  def l2Col(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x))

  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))
}
