package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** BM25 ranked retrieval over the document corpus — the keyword-search path
  * of a training-data pipeline (nearest cousin of the reference's embedding
  * search, but lexical): per-(query, doc) score
  * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), Lucene's
  * +1-inside-the-log idf so scores stay positive.
  *
  * Scale shape: the corpus is NEVER shuffled whole. Document length and the
  * corpus stats (N, Σdl) are map-side projections of the scan; tokens are
  * filtered to the query vocabulary BY A BROADCAST SEMI-JOIN before the
  * per-(doc, term) tf aggregate, so only postings for queried terms reach
  * an exchange — at 100 TB that is |docs containing a query term| rows of
  * (16-byte id, term, counts), not the corpus. df/idf is a per-term count
  * of that same frame (tiny — bounded by the query vocabulary) and rides
  * back as a broadcast, as do the 1-row stats and the query list itself.
  *
  * Determinism across engines: idf is float32-quantized immediately after
  * `ln` (the libm-lane collapse used by text_surprisal); every other factor
  * is IEEE double arithmetic on exact integers (tf, dl, N, Σdl), so the
  * per-(query, doc, term) score renders to identical integer micros in the
  * JVM and DuckDB, and per-doc totals are order-free bigint sums.
  */
object Bm25 {

  val K1 = 1.2
  val B  = 0.75

  private def f32micros(c: org.apache.spark.sql.Column) =
    floor(c.cast("float").cast("double") * lit(1000000.0) + lit(0.5)).cast("long")

  /** Per-(query_id, doc_id) BM25 totals: score_micros (order-free bigint sum
    * of per-term integer micros) and n_terms matched. `queries` is the tiny
    * (query_id, term) relation.
    */
  def scores(docs: DataFrame, queries: DataFrame,
             k1: Double = K1, b: Double = B): DataFrame = {
    val terms = queries.select("term").distinct()
    val toks = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
      .join(broadcast(terms), "term") // map-side probe: only queried terms survive
    // tf feeds BOTH the df aggregate and the scoring join; without a
    // materialization Spark re-plans the whole scan+explode subtree for
    // each consumer (two corpus scans, two explodes). The frame itself is
    // |docs matching a query term| × |matched terms| rows of ids+counts —
    // the small thing the big pass exists to produce — so checkpoint it.
    val tf = graft.GraftCache.stage(
      toks.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf")))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val st = docs.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_tokens"))
    val avgdl = col("tot_tokens").cast("double") / col("n_docs").cast("double")
    val idf = f32micros(
      log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .cast("double") / lit(1000000.0)
    val tfn = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    tf.join(broadcast(df_), "term")
      .crossJoin(broadcast(st))
      .join(broadcast(queries), "term")
      .withColumn("sm", floor((idf * tfn) * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("sm").as("score_micros"))
  }

  /** Exact top-k per query by (score desc, doc_id) WITHOUT a per-query
    * global sort: a per-query window partition holds every matching doc —
    * at 100 TB a common-term query matches most of the corpus, making
    * `partitionBy(query_id)` one giant sorted task. Two-phase tournament
    * instead: per-(query, doc-hash bucket) top-k first (256 small sorted
    * partitions per query), then the final k from the ≤ 256·k survivors.
    * Exact because the global top-k is a subset of the bucket top-ks, and
    * deterministic because integer-micros ties break on doc_id in both
    * phases.
    */
  def topK(scored: DataFrame, k: Int): DataFrame = {
    val cand = scored.withColumn("__b", pmod(col("doc_id"), lit(256)))
    val w1 = Window.partitionBy("query_id", "__b")
      .orderBy(col("score_micros").desc, col("doc_id"))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("score_micros").desc, col("doc_id"))
    cand.withColumn("__rn", row_number().over(w1)).filter(col("__rn") <= k)
      .withColumn("rank", row_number().over(w2).cast("long")).filter(col("rank") <= k)
      .drop("__b", "__rn")
  }
}
