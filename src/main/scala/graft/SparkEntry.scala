package graft

import graft.attacks.Attacks
import graft.functions.GraftCols
import graft.graph.KnnGraph
import graft.knn.Knn
import graft.metrics.Metrics
import graft.watermark.{Scpw, ScpwKey, TabularMark, TmKey, Tvp, WmKey}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with bit-exact DuckDB oracle SQL wherever the operator is
  * SQL-expressible (FIXTURES.md oracle-parity note). Non-SQL operators (the
  * bit codec of watermarking.py:53–117) are registered without oracle SQL and
  * carry invariant-based ScalaTest coverage instead.
  */
object SparkEntry {

  private val key       = WmKey(seed = "20")
  private val D         = 64 // fixture embedding dimensionality
  private val WM        = "10101"
  private val Strength  = 0.6
  private val DeleteP   = 0.3
  private val Seed      = "42"
  private val M         = 8 // HNSW parameter of the reference (watermarking.py:285)
  private val scpwKey   = ScpwKey(topK = 20, position = 30, stdE = 0.05, seed = "20")
  private val tmKey     = TmKey(nw = 100, p = 4.0, k = 40, position = 50)
  private lazy val dims = key.dims(D)

  // ---- shared derived frames, memoized per sf dir (GraftCache) ----
  private def rawKnn(s: SparkSession, dir: String) =
    GraftCache.memo(s"$dir/rawknn") {
      KnnGraph.rawKnn(Tables.embeddings(s, dir), 2 * M + 1)
    }
  private def edges(s: SparkSession, dir: String) =
    GraftCache.memo(s"$dir/edges") {
      KnnGraph.edges(Tables.embeddings(s, dir), M, Some(rawKnn(s, dir)))
    }
  private def ai(s: SparkSession, dir: String) =
    GraftCache.memo(s"$dir/ai") {
      KnnGraph.accessibility(Tables.embeddings(s, dir), edges(s, dir))
    }

  /** Flagship on sf0.001: RS watermark round-trip — embeds WM, extracts it
    * back, returns per-bit (wm_bit, extracted_bit) rows.
    */
  def entry(spark: SparkSession): DataFrame =
    rsRoundtrip(spark, "/root/testdata/sf0.001")

  private def rsRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val emb  = Tables.embeddings(spark, dir)
    val wmDf = Tvp.embedRs(emb, WM, Strength, D, key)
    Tvp.bitsDf(spark, WM)
      .join(Tvp.extract(wmDf, WM.length, D, key), "bit_pos")
      .select(col("bit_pos").cast("long"), col("wm_bit").cast("long"),
        col("extracted_bit").cast("long"))
      .orderBy("bit_pos")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(38,6)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(38,6)")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(38,6)")).as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast("decimal(38,6)")).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "wm_content_id" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          GraftCols.contentIdCol(col("embedding"), dims.init.toSeq, key.scale).as("content_id"))
        .orderBy("vec_id")
    }),

    "wm_group_sizes" -> ((s, dir) => {
      Tvp.classify(Tables.embeddings(s, dir), D, WM.length, key)
        .groupBy(col("group_id").cast("long").as("group_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy("group_id")
    }),

    "wm_rs_roundtrip" -> ((s, dir) => rsRoundtrip(s, dir)),

    "attack_random_delete" -> ((s, dir) => {
      Attacks.randomDelete(Tables.embeddings(s, dir), DeleteP, Seed)
        .select("vec_id").orderBy("vec_id")
    }),

    // J1 — broadcast-kernel kNN, oracle-checked on a 100-query sample (the
    // kernel folds squared diffs left-to-right in double, bit-matching the
    // DuckDB lambda fold).
    "knn_topk_sample" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Knn.exact(emb.filter(col("vec_id") < 100), emb, 5)
        .select(col("query_id"), col("neighbor_id"), col("dist"), col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    // A6 — query-traffic profile over the deterministic kNN graph.
    "wm_query_counts" -> ((s, dir) => {
      KnnGraph.queryCounts(Tables.embeddings(s, dir), rawKnn(s, dir), k = 10)
        .orderBy("vec_id")
    }),

    // J5 + A9 — histogram of bidirectional-edge counts (t_vector/e4).
    "graph_bidir_hist" -> ((s, dir) => {
      KnnGraph.bidirectionalEdges(Tables.embeddings(s, dir), edges(s, dir))
        .groupBy(col("bidir_edges")).agg(count(lit(1)).as("n"))
        .orderBy("bidir_edges")
    }),

    // A5 — accessibility index (z-blend of J5/J6 metrics).
    "wm_accessibility" -> ((s, dir) => {
      ai(s, dir).select(col("vec_id"), round(col("ai"), 9).as("ai")).orderBy("vec_id")
    }),

    // K2 — adaptive deletion by accessibility rank.
    "attack_adaptive_delete" -> ((s, dir) => {
      Attacks.adaptiveDelete(Tables.embeddings(s, dir), ai(s, dir), DeleteP)
        .select("vec_id").orderBy("vec_id")
    }),

    // E1(TVP)+E2 — full accessibility-guided embed/extract round-trip.
    "wm_tvp_roundtrip" -> ((s, dir) => {
      val emb  = Tables.embeddings(s, dir)
      val wmDf = Tvp.embedAi(emb, WM, Strength, 0.5, ai(s, dir), D, key)
      Tvp.bitsDf(s, WM)
        .join(Tvp.extract(wmDf, WM.length, D, key), "bit_pos")
        .select(col("bit_pos").cast("long"), col("wm_bit").cast("long"),
          col("extracted_bit").cast("long"))
        .orderBy("bit_pos")
    }),

    // H3/SO1 — embedding impact on kNN results: per-carrier miss/false averages.
    "impact_embed_missfalse" -> ((s, dir) => {
      val emb  = Tables.embeddings(s, dir)
      val base = rawKnn(s, dir).filter(col("rank") <= 10)
      val cl   = Tvp.classify(emb, D, WM.length, key)
      val carriers = Tvp.carriersRs(cl, Tvp.bitsDf(s, WM), Strength, key.seed)
      val wmDf  = Tvp.applyEmbed(emb, carriers, D, key)
      val after = Knn.exact(emb, wmDf, 10)
      val mf = Metrics.missFalse(
        Metrics.carrierHits(base, carriers),
        Metrics.carrierHits(after, carriers))
      mf.agg(
        round(avg("miss"), 6).as("avg_miss"),
        round(avg("false_hits"), 6).as("avg_false"),
        count(lit(1)).as("n_carriers"))
    }),

    // H4/SO2 — attack impact on kNN accuracy: hit-rate after random deletion.
    "attack_hit_rate" -> ((s, dir) => {
      import s.implicits._
      val emb   = Tables.embeddings(s, dir)
      val base  = rawKnn(s, dir).filter(col("rank") <= 10)
      val att   = Attacks.randomDelete(emb, DeleteP, Seed)
      val after = Knn.exact(emb, att, 10)
      Seq(("hit_rate_after_delete", Metrics.hitRate(base, after, 10)))
        .toDF("metric", "value")
    }),

    // SCPW A1 — md5 grouping over the first-topK-dims content id.
    "scpw_group_sizes" -> ((s, dir) => {
      Scpw.classify(Tables.embeddings(s, dir), WM.length, scpwKey)
        .groupBy(col("group_id").cast("long").as("group_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy("group_id")
    }),

    // A4/P10 — exact column stats feeding the SCPW noise constants
    // (decimal sums so DuckDB matches bit-for-bit; μ/σ² derive from these).
    "scpw_column_stats" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(element_at(col("embedding"), scpwKey.position + 1).cast("double").as("v"))
        .agg(
          sum(col("v").cast("decimal(38,12)")).as("sum_val"),
          sum((col("v") * col("v")).cast("decimal(38,12)")).as("sum_sq"),
          count(lit(1)).as("n"))
    }),

    // SCPW end-to-end embed/extract round-trip.
    "scpw_roundtrip" -> ((s, dir) => {
      val emb  = Tables.embeddings(s, dir)
      val wmDf = Scpw.embed(emb, WM, Strength, scpwKey)
      Tvp.bitsDf(s, WM)
        .join(Scpw.extract(wmDf, WM.length, scpwKey), "bit_pos")
        .select(col("bit_pos").cast("long"), col("wm_bit").cast("long"),
          col("extracted_bit").cast("long"))
        .orderBy("bit_pos")
    }),

    // J2 — content-key equi-join with first-match semantics (self-match run).
    "tm_match_clean" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      TabularMark.matchTuples(emb, emb, tmKey)
        .orderBy("wm_id")
    }),

    // A8 — TabularMark embed + z-test detection.
    "tm_detect" -> ((s, dir) => {
      val emb  = Tables.embeddings(s, dir)
      val wmDf = TabularMark.embed(emb, tmKey)
      TabularMark.detect(emb, wmDf, tmKey)
        .select(col("nw"), col("n_matched"), col("ng"), round(col("z"), 9).as("z"), col("detected"))
    }),
  )

  /** DuckDB-side content-id expression mirroring GraftCols.contentIdCol
    * (0-based dims; DuckDB list indexing is 1-based like element_at).
    */
  private def cidSql(ds: Seq[Int], scale: Double): String =
    ds.map(d => s"substr(cast(cast(trunc(abs(embedding[${d + 1}]) * $scale) as bigint) as varchar),1,1)")
      .mkString(" || ")

  /** DuckDB Horner fold = full-128-bit int(md5hex,16) % m (Hashing.md5Mod). */
  private def md5ModSql(expr: String, m: Int): String =
    s"cast(list_reduce(list_transform(string_split(md5($expr), ''), " +
      s"x -> strpos('0123456789abcdef', x) - 1), (a, b) -> (a * 16 + b) % $m) as bigint)"

  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(cast(l_quantity as decimal(38,6))) AS sum_qty,
        |  sum(cast(l_extendedprice as decimal(38,6))) AS sum_base_price,
        |  sum(cast(l_extendedprice * (1.0 - l_discount) as decimal(38,6))) AS sum_disc_price,
        |  sum(cast(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) as decimal(38,6))) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "wm_content_id" ->
      s"""SELECT vec_id, ${cidSql(dims.init.toSeq, key.scale)} AS content_id
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "wm_group_sizes" ->
      s"""WITH c AS (SELECT ${cidSql(dims.init.toSeq, key.scale)} AS content_id FROM embeddings)
         |SELECT ${md5ModSql("content_id", WM.length)} AS group_id, count(*) AS n
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "attack_random_delete" ->
      s"""WITH ranked AS (
         |  SELECT vec_id,
         |    row_number() OVER (ORDER BY md5(cast(vec_id as varchar) || '#del#$Seed'), vec_id) AS rn,
         |    count(*) OVER () AS n
         |  FROM embeddings)
         |SELECT vec_id FROM ranked WHERE rn <= n - ceil(n * $DeleteP) ORDER BY vec_id""".stripMargin,

    "knn_topk_sample" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 100),
         |pairs AS (
         |  SELECT q.query_id, c.vec_id AS neighbor_id,
         |    sqrt(list_reduce(list_transform(range(1, ${D + 1}),
         |      i -> (cast(qe[i] as double) - cast(c.embedding[i] as double))
         |         * (cast(qe[i] as double) - cast(c.embedding[i] as double))),
         |      (a, b) -> a + b)) AS dist
         |  FROM q, embeddings c)
         |SELECT query_id, neighbor_id, dist,
         |  cast(row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) as bigint) AS rank
         |FROM pairs QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "scpw_group_sizes" ->
      s"""WITH c AS (SELECT ${cidSql(0 until scpwKey.topK, scpwKey.scale)} AS content_id FROM embeddings)
         |SELECT ${md5ModSql("content_id", WM.length)} AS group_id, count(*) AS n
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "scpw_column_stats" ->
      s"""SELECT
         |  sum(cast(cast(embedding[${scpwKey.position + 1}] as double) as decimal(38,12))) AS sum_val,
         |  sum(cast(cast(embedding[${scpwKey.position + 1}] as double)
         |         * cast(embedding[${scpwKey.position + 1}] as double) as decimal(38,12))) AS sum_sq,
         |  count(*) AS n
         |FROM embeddings""".stripMargin,

    "tm_match_clean" ->
      s"""WITH ids AS (SELECT vec_id, ${cidSql(0 until tmKey.k, tmKey.scale)} AS id FROM embeddings),
         |pks AS (SELECT id, min(vec_id) AS orig_id FROM ids WHERE vec_id < ${tmKey.nw} GROUP BY id)
         |SELECT pks.orig_id, ids.id, ids.vec_id AS wm_id
         |FROM ids JOIN pks ON ids.id = pks.id
         |ORDER BY wm_id""".stripMargin,
  )
}
