package graft.watermark

import graft.functions.{GraftCols, Hashing}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** TabularMark — relational-watermarking baseline (reference tabularMark.py).
  *
  * Scheme: for the first `nw` tuples, perturb dimension `position` by a value
  * drawn from the "green" half of a seeded random bipartition of [-p, p]
  * (`divide_interval_randomly`, tabularMark.py:48–105). Detection re-matches
  * tuples by content key, classifies each perturbation's category, and runs a
  * one-sided z-test (z > 1.96, tabularMark.py:170–190).
  *
  * Deviation: the reference seeds Python's PRNG with the tuple-id STRING
  * (tabularMark.py:56) — unreplicable hash; here every draw is keyed md5 of
  * (id, op, index). Interval-structure invariants (alternating categories,
  * each summing to p) are preserved and property-tested.
  */
final case class TmKey(nw: Int = 100, p: Double = 4.0, k: Int = 40,
                       position: Int = 50, alpha: Double = 1.96, scale: Double = 1000.0)

object TabularMark {

  type Segments = Vector[(Double, Double)]

  /** P12 (tabularMark.py:48–105): split [-p,p] into random segments assigned
    * alternately to the currently-shorter category until one reaches total
    * length p; trim that one to exactly p and give the remainder to the other.
    */
  def divideInterval(p: Double, idSeed: String): (Segments, Segments) = {
    var cat1, cat2 = Vector.empty[(Double, Double)]
    var len1, len2 = 0.0
    var start      = -p
    var i          = 0
    var reached    = false
    while (start < p && !reached) {
      val maxPossible = math.min(p - start, p)
      val segLen      = 1.0 + (maxPossible - 1.0) * Hashing.unitUniform(s"$idSeed|seg|$i")
      val end         = start + segLen
      if (len1 <= len2) { cat1 :+= ((start, end)); len1 += segLen }
      else { cat2 :+= ((start, end)); len2 += segLen }
      if (len1 >= p || len2 >= p) reached = true else start = end
      i += 1
    }
    if (len1 >= p) {
      val lastStart = cat1.last._1
      cat1 = cat1.init
      val newEnd = lastStart + (p - cat1.map(s => s._2 - s._1).sum)
      cat1 :+= ((lastStart, newEnd))
      cat2 :+= ((newEnd, p))
    } else if (len2 >= p) {
      val lastStart = cat2.last._1
      cat2 = cat2.init
      val newEnd = lastStart + (p - cat2.map(s => s._2 - s._1).sum)
      cat2 :+= ((lastStart, newEnd))
      cat1 :+= ((newEnd, p))
    }
    (cat1, cat2)
  }

  /** P13 (tabularMark.py:107–115): uniform draw from a random segment. */
  def chooseFromCategory(cat: Segments, drawKey: String): Double = {
    val seg = cat(Hashing.md5Mod(s"$drawKey|pickseg", cat.length.toLong).toInt)
    Hashing.uniform(s"$drawKey|inseg", seg._1, seg._2)
  }

  /** P14 (tabularMark.py:156–168): 0 if in category 1 ("green"), 1 if in
    * category 2, -1 if in neither.
    */
  def findCategory(x: Double, cat1: Segments, cat2: Segments): Int =
    if (cat1.exists { case (s, e) => s <= x && x <= e }) 0
    else if (cat2.exists { case (s, e) => s <= x && x <= e }) 1
    else -1

  private def cid(key: TmKey) =
    GraftCols.contentIdCol(col("embedding"), 0 until key.k, key.scale)

  /** Embed (tabularMark.py:117–127): carriers are the PREFIX vec_id < nw
    * (W5 quirk); green-category offset added to dim `position` in float32.
    */
  def embed(df: DataFrame, key: TmKey): DataFrame = {
    val p = key.p
    val offsetUdf = udf((vec: Array[Float], id: String) => {
      val (cat1, _) = divideInterval(p, id)
      val out = vec.clone()
      out(key.position) = (out(key.position).toDouble + chooseFromCategory(cat1, s"$id|emb")).toFloat
      out
    })
    df.withColumn("embedding",
      when(col("vec_id") < key.nw, offsetUdf(col("embedding"), cid(key)))
        .otherwise(col("embedding")))
  }

  /** J2 — content-key matching (`Matching_vector`, tabularMark.py:129–154):
    * every watermarked row joins the FIRST original carrier tuple (lowest
    * vec_id) sharing its content id; a carrier can match many rows, a row at
    * most one carrier (reference `break` on first pk).
    * Returns (orig_id, id, wm_id).
    */
  def matchTuples(orig: DataFrame, wm: DataFrame, key: TmKey): DataFrame = {
    val pks = orig.filter(col("vec_id") < key.nw)
      .select(col("vec_id").as("orig_id"), cid(key).as("id"))
      .groupBy("id").agg(min("orig_id").as("orig_id"))
    wm.select(col("vec_id").as("wm_id"), cid(key).as("id"))
      .join(broadcast(pks), "id")
      .select("orig_id", "id", "wm_id")
  }

  /** A8 — detection (`watermark_extrction`, tabularMark.py:170–190):
    * ng = matched tuples whose perturbation lies green; z-test vs alpha.
    * Returns one row (nw, n_matched, ng, z, detected).
    */
  /** Per-matched-row green/red category — the detection ingredients BEFORE
    * aggregation. Returns (wm_id, orig_id, cat); row-wise and attack-set
    * independent, so deletion grids compute it once and filter.
    */
  def matchedCats(orig: DataFrame, wm: DataFrame, key: TmKey): DataFrame =
    matchedCatsTagged(orig, wm, key, Nil)

  /** matchedCats over a TAGGED frame: `wm` carries extra cell-tag columns
    * (e.g. an attack-rate axis) and each tagged copy matches/categorizes
    * independently — one broadcast-join plan for a whole attack grid.
    */
  def matchedCatsTagged(orig: DataFrame, wm: DataFrame, key: TmKey,
                        tags: Seq[String]): DataFrame = {
    val p = key.p
    val greenUdf = udf((diff: Double, id: String) => {
      val (cat1, cat2) = divideInterval(p, id)
      findCategory(diff, cat1, cat2)
    })
    val pks = orig.filter(col("vec_id") < key.nw)
      .select(col("vec_id").as("orig_id"), cid(key).as("id"))
      .groupBy("id").agg(min("orig_id").as("orig_id"))
    val ov = orig.select(col("vec_id").as("orig_id"),
      element_at(col("embedding"), key.position + 1).as("orig_val"))
    wm.select(tags.map(col) ++ Seq(col("vec_id").as("wm_id"), cid(key).as("id"),
        element_at(col("embedding"), key.position + 1).as("wm_val")): _*)
      .join(broadcast(pks), "id")
      .join(broadcast(ov), "orig_id")
      .withColumn("cat", greenUdf((col("wm_val") - col("orig_val")).cast("double"), col("id")))
      .select(tags.map(col) ++ Seq(col("wm_id"), col("orig_id"), col("cat")): _*)
  }

  def detect(orig: DataFrame, wm: DataFrame, key: TmKey): DataFrame = {
    val matched = matchedCats(orig, wm, key)
    matched.agg(
        lit(key.nw).cast("long").as("nw"),
        count(lit(1)).as("n_matched"),
        sum(when(col("cat") === 0, 1).otherwise(0)).as("ng"))
      .withColumn("z", lit(2.0) * (col("ng") - lit(0.5) * col("nw")) / sqrt(col("nw").cast("double")))
      .withColumn("detected", col("z") > key.alpha)
  }
}
