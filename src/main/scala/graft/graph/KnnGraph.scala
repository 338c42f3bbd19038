package graft.graph

import graft.knn.Knn
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** HNSW-graph analytics re-based on a deterministic kNN graph (SURVEY §2.7).
  *
  * The reference reads ONLY the level-0 adjacency lists of a FAISS
  * `IndexHNSWFlat` (watermarking.py:294–295, sliced at :168–174) — never the
  * hierarchy — and FAISS HNSW construction is seed/order-dependent, so graph
  * bit-compat is impossible and not required. G7: the stand-in is the exact
  * directed kNN graph with out-degree 2M (the level-0 capacity), built from
  * one broadcast kNN pass; everything downstream of a given graph is then
  * deterministic.
  */
object KnnGraph {

  /** Raw kNN (self included) — one pass reused by edges() and queryCounts().
    * Uses the "fold" kernel: its distances are bit-identical to the DuckDB
    * lambda fold, which makes every downstream graph metric oracle-checkable
    * (the fast kernel is ~2× quicker but differs in final ulps).
    */
  def rawKnn(df: DataFrame, k: Int): DataFrame = Knn.exact(df, df, k, kernel = "fold")

  /** G7 — directed edge table (src, dst, dist), 2M edges per node, self
    * excluded, re-ranked after self-removal.
    */
  def edges(df: DataFrame, m: Int, raw: Option[DataFrame] = None): DataFrame = {
    val k   = 2 * m
    val base = raw.getOrElse(rawKnn(df, k + 1))
    val w    = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("neighbor_id"))
    base.filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("r2", row_number().over(w))
      .filter(col("r2") <= k)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"), col("dist"))
  }

  /** J5 — bidirectional-edge count per node
    * (`count_bidirectional_edges`, watermarking.py:177–186): |{m ∈ N(n) :
    * n ∈ N(m)}| via a semi-join of the edge list against its own reversal.
    * Nodes with zero reciprocal edges still appear (count 0).
    */
  def bidirectionalEdges(df: DataFrame, edgesDf: DataFrame): DataFrame = {
    val rev = edgesDf.select(col("dst").as("src"), col("src").as("dst"))
    val cnt = edgesDf.join(rev, Seq("src", "dst"), "left_semi")
      .groupBy("src").agg(count(lit(1)).as("bidir_edges"))
    df.select(col("vec_id"))
      .join(cnt, col("vec_id") === col("src"), "left")
      .select(col("vec_id"), coalesce(col("bidir_edges"), lit(0L)).as("bidir_edges"))
  }

  /** J6 — mean L2 length of a node's out-edges
    * (`calculate_average_neighbor_distance`, watermarking.py:188–201).
    * Distances ride on the edges from construction — no second join against
    * the vector table. Nodes without edges yield NaN (np.mean([]) semantics).
    * The mean folds the (sorted) distances left-to-right in double — a fixed
    * summation order, so the result is reproducible under any partitioning
    * and bit-identical to the DuckDB ordered-list fold (decimal sums are
    * also order-free but decimal→double conversion differs across engines
    * in final ulps).
    */
  def avgEdgeLength(df: DataFrame, edgesDf: DataFrame): DataFrame = {
    val agg = edgesDf.groupBy("src").agg(
      (aggregate(
        transform(array_sort(collect_list(struct(col("dist"), col("dst")))),
          x => x.getField("dist")),
        lit(0.0), (a, x) => a + x) / count(lit(1)))
        .as("avg_edge_len"))
    df.select(col("vec_id"))
      .join(agg, col("vec_id") === col("src"), "left")
      .select(col("vec_id"), coalesce(col("avg_edge_len"), lit(Double.NaN)).as("avg_edge_len"))
  }

  /** A5 — accessibility index (watermarking.py:249–272):
    * AI = 0.5·z(avg_edge_len) − 0.5·z(bidir_edges), z-scores over the
    * NaN-ignoring population mean/std (np.nanmean/np.nanstd).
    * Returns (vec_id, ai).
    *
    * Population stats use μ = Σx/n, σ = sqrt(max(Σx²/n − μ², 0)) with the
    * sums carried as EXACT integers — bidir_edges is already integral, and
    * avg_edge_len (and its square) is quantized to floor(x·1e9 + 0.5) nanos
    * before summing, the same construction as internalEdgeStats and
    * graph_cluster_stats. Integer sums are associative and fold-order-free,
    * so the means are bit-reproducible under ANY partitioning with bounded
    * per-task aggregation state (ordinary partial HashAggregate — no
    * collect_list buffer, no single reducer), and the DuckDB oracle replays
    * the identical integer sums and double divisions bit-for-bit. The 1e-9
    * quantum is far below the metric's information content (the graph is
    * already a documented stand-in for the reference's seed-dependent FAISS
    * HNSW level-0 lists; np.nanstd differs in final ulps regardless).
    * Overflow bound: the bigint nano-sums wrap (silently in Spark, loudly in
    * DuckDB) around ~9·10⁹ rows of O(1) values per group — see
    * SparkEntry.sumNanosSql for the full bound and the decimal(38,0)
    * escape hatch for corpora beyond it.
    */
  def accessibility(df: DataFrame, edgesDf: DataFrame): DataFrame = {
    val metrics = bidirectionalEdges(df, edgesDf)
      .join(avgEdgeLength(df, edgesDf), "vec_id")
    val dOk = when(isnan(col("avg_edge_len")), lit(null)).otherwise(col("avg_edge_len"))
    val eL  = col("bidir_edges")
    def nano(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") * lit(1.0e9) + lit(0.5))
    val stats = metrics.agg(
      sum(eL).as("s_e"),
      sum(eL * eL).as("q_e"),
      count(eL).as("n_e"),
      sum(nano(dOk)).as("s_d"),
      sum(nano(dOk * dOk)).as("q_d"),
      count(dOk).as("n_d"))
      .withColumn("mu_e", col("s_e").cast("double") / col("n_e").cast("double"))
      .withColumn("msq_e", col("q_e").cast("double") / col("n_e").cast("double"))
      .withColumn("mu_d",
        col("s_d").cast("double") / lit(1.0e9) / col("n_d").cast("double"))
      .withColumn("msq_d",
        col("q_d").cast("double") / lit(1.0e9) / col("n_d").cast("double"))
      .select("mu_e", "msq_e", "mu_d", "msq_d")
    metrics.crossJoin(broadcast(stats))
      .withColumn("sd_e", sqrt(greatest(col("msq_e") - col("mu_e") * col("mu_e"), lit(0.0))))
      .withColumn("sd_d", sqrt(greatest(col("msq_d") - col("mu_d") * col("mu_d"), lit(0.0))))
      .withColumn("ai",
        lit(0.5) * ((col("avg_edge_len") - col("mu_d")) / col("sd_d")) -
        lit(0.5) * ((col("bidir_edges") - col("mu_e")) / col("sd_e")))
      .select(col("vec_id"), col("ai"))
  }

  /** A6 — query-count profiling (watermarking.py:302–308): every vector
    * queries its top-`k`; each hit that isn't the query itself increments the
    * neighbor's counter. Nodes never hit count 0.
    * `raw` should include self-matches (they occupy a top-k slot, as in the
    * reference where the query IS a corpus vector).
    */
  def queryCounts(df: DataFrame, raw: DataFrame, k: Int = 10): DataFrame = {
    val cnt = raw.filter(col("rank") <= k && col("neighbor_id") =!= col("query_id"))
      .groupBy("neighbor_id").agg(count(lit(1)).as("query_count"))
    df.select(col("vec_id"))
      .join(cnt, col("vec_id") === col("neighbor_id"), "left")
      .select(col("vec_id"), coalesce(col("query_count"), lit(0L)).as("query_count"))
  }

  /** G5 — BFS flood from seed nodes over directed edges
    * (t_vector/e1_steath_vector.py:41–54): returns (vec_id, component) for
    * all nodes reachable from any seed; driver-side frontier loop, each step
    * one join — frontier sets are small in the reference's use.
    */
  /** G6 — seed-component labeling (e1_steath_vector.py:41–54 bfs loop):
    * every node reachable from a seed gets the MINIMUM seed id that reaches
    * it, which is exactly the reference's first-seed-wins shared-visited BFS
    * (seeds iterate in ascending id order). Iterative min-label propagation —
    * each round one join + one min-aggregate, the standard distributed
    * connected-components shape; rounds bounded by the reached subgraph's
    * diameter. Returns (vec_id, comp).
    */
  def components(edgesDf: DataFrame, seeds: DataFrame, maxIter: Int = 50): DataFrame = {
    // Pregel-style loop: every round's frame is localCheckpoint'ed (lazily —
    // GraftCache.stage; the round's sig() probe materializes it) so lineage
    // (and Catalyst analysis cost) stays O(1) across rounds instead of
    // O(rounds); on a multi-executor cluster swap for reliable checkpoint().
    // Fixpoint witness: the node set only grows and per-node labels only
    // decrease, so an unchanged (count, sum(comp)) pair implies no change —
    // one scalar aggregate per round instead of an anti-join pass.
    var labels = graft.GraftCache.stage(
      seeds.select(col("vec_id"), col("vec_id").as("comp")).distinct())
    def sig(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(col("comp").cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    var cur  = sig(labels)
    var done = false
    var i    = 0
    while (!done && i < maxIter) {
      val prop = labels.join(edgesDf, labels("vec_id") === edgesDf("src"))
        .select(col("dst").as("vec_id"), col("comp"))
      val next = graft.GraftCache.stage(labels.unionByName(prop)
        .groupBy("vec_id").agg(min("comp").as("comp")))
      val ns = sig(next)
      done = ns._1 == cur._1 && ns._2.compareTo(cur._2) == 0
      labels = next
      cur = ns
      i += 1
    }
    // silent unconverged labels would ship wrong canonical ids with no error
    // signal — fail loudly instead (a chain diameter beyond maxIter means the
    // caller must raise the cap, not trust the partial fixpoint)
    require(done,
      s"components() hit maxIter=$maxIter without reaching the fixpoint witness; raise maxIter")
    labels
  }

  /** UNDIRECTED connected components via alternating large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    * O(log² n)-ROUND algorithm, vs `components`' min-label propagation whose
    * round count is the graph DIAMETER. On the kNN graph (small-world,
    * diameter ~log n) both are fine; on a high-diameter graph (a path, a
    * lineage chain, a road network) label propagation needs one round per
    * hop and never finishes at scale — CcScaleProbe shows the stars close a
    * 100k-node path in ~a dozen rounds where propagation's cap trips.
    *
    * State per round is the EDGE LIST (rows, never a per-node buffer):
    *   large-star: ∀u, ∀v ∈ N(u) with v > u → emit {v, min(N⁺(u))}
    *   small-star: ∀u, m = min(N⁺(u)) → emit {v, m} ∀v ∈ N(u), v ≤ u; {u, m}
    * alternated to the exact fixpoint (edge set unchanged), at which the
    * edges form stars rooted at component minima. Labels: min(self,
    * neighbors). Edges are treated as undirected regardless of input
    * direction; CcSpec pins parity against a union-find ground truth on
    * adversarial shapes (paths, cycles, stars, random graphs).
    */
  /** Rounds the last componentsUndirected call took to converge — probe
    * introspection only (CcScaleProbe's round-count evidence), not API.
    */
  @volatile private[graft] var lastStarRounds: Int = -1

  def componentsUndirected(edgesDf: DataFrame, maxIter: Int = 60): DataFrame = {
    def canon(u: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
      Seq(least(u, v).as("a"), greatest(u, v).as("b"))
    def sym(e: DataFrame): DataFrame =
      e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
    def mins(s: DataFrame): DataFrame =
      s.groupBy("u").agg(min("v").as("__mn"))
        .select(col("u"), least(col("__mn"), col("u")).as("m"))
    var e = graft.GraftCache.stage(edgesDf
      .select(canon(col("src").cast("long"), col("dst").cast("long")): _*)
      .filter(col("a") =!= col("b")).distinct())
    // per-round convergence probe: one scalar aggregate (count + two exact
    // decimal sums + a keyed mix) instead of two exceptAll passes — the
    // EXACT set compare runs only when the cheap signature repeats, i.e.
    // normally once, on the converged round
    def sig(df: DataFrame): (Long, java.math.BigDecimal, java.math.BigDecimal) = {
      val zero = java.math.BigDecimal.ZERO
      val r = df.agg(count(lit(1)),
        coalesce(sum(col("a").cast("decimal(38,0)")), lit(zero)),
        coalesce(sum((col("a") * lit(1000003L) + col("b")).cast("decimal(38,0)")),
          lit(zero))).head()
      (r.getLong(0), r.getDecimal(1), r.getDecimal(2))
    }
    var cur = sig(e)
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      val sL = sym(e)
      // ls is consumed twice inside the same round (mins + join) but the
      // round's OUTPUT (ss) is checkpointed, so lineage depth stays one
      // round either way — no checkpoint here, one less materialization
      val ls = sL.join(mins(sL), "u").filter(col("v") > col("u"))
        .select(canon(col("v"), col("m")): _*)
        .filter(col("a") =!= col("b")).distinct()
      val sS = sym(ls)
      val mS = mins(sS)
      val ss = sS.join(mS, "u").filter(col("v") <= col("u"))
        .select(canon(col("v"), col("m")): _*)
        .union(mS.select(canon(col("u"), col("m")): _*))
        .filter(col("a") =!= col("b")).distinct().transform(graft.GraftCache.stage)
      val ns = sig(ss)
      // exact fixpoint: the canonical edge set is unchanged by a full round
      done = ns == cur && ss.exceptAll(e).isEmpty && e.exceptAll(ss).isEmpty
      e = ss
      cur = ns
      i += 1
    }
    require(done,
      s"componentsUndirected hit maxIter=$maxIter without converging; raise the cap")
    lastStarRounds = i
    // stars: every non-root node carries exactly its root as the smaller
    // endpoint; roots label themselves
    val nodes = e.select(col("a").as("vec_id"))
      .union(e.select(col("b").as("vec_id"))).distinct()
    nodes.join(e.select(col("b").as("vec_id"), col("a").as("__root")),
        Seq("vec_id"), "left")
      .groupBy("vec_id")
      .agg(coalesce(min(col("__root")), col("vec_id")).as("comp"))
  }

  /** Bucket count of the persisted edge table. 32 matches the engine's
    * shuffle-partition count so a bucketed SMJ probe side exchanges into
    * exactly the bucket layout; at a real deployment both knobs scale
    * together with the cluster.
    */
  val EdgeBuckets = 32

  /** SCALABLE G7 CONSTRUCTION — build the layered graph-ANN artifact by
    * CHUNKED INSERTION instead of one exact all-pairs pass. `edges()`
    * builds through `Knn.exact(df, df)`, which is hard-capped at the
    * broadcast byte wall (`graft.knn.broadcastMaxBytes`) — the one index
    * construction that could not exceed driver memory. This composes the
    * machinery that already IS scale-safe: exact-build a broadcast-sized
    * SEED chunk, then add the remaining chunks batch-by-batch through
    * `GraphAnn.insertBatch` (HNSW's add in batch form — each batch runs
    * the layered search against the artifact built so far, executor-side
    * joins only). The reference itself builds HNSW incrementally by
    * insertion (watermarking.py:285–290, index.add); this is that
    * procedure with deterministic batch boundaries.
    *
    * Chunk membership is CLOSED-FORM (keyed md5-mod of vec_id), so the
    * whole build is a pure function of (corpus, m, nChunks, params) — no
    * arrival order, no RNG — and replays as SQL: the seed layers are the
    * standard rank-then-re-rank kNN derivation, each batch is one chained
    * insert replay (`ann_graph_build_incremental` oracle-checks the final
    * layers' per-src fingerprints at the registered seed-4-of-8
    * configuration — four chained insert replays).
    *
    * Semantics trade (documented, same as insertBatch): nodes of batch c
    * link only against chunks < c — within-batch blindness, the standard
    * bulk-add bargain; `ann_graph_build_recall` gauges the effect against
    * the exact-built graph. nChunks = 1 degenerates to the exact build
    * (spec-pinned bit-identical).
    *
    * 100 TB shape: only the SEED (corpus/nChunks rows — the caller sizes
    * nChunks so that fits the byte wall) ever crosses the driver; every
    * batch costs |batch| layered searches plus two grouped re-ranks, all
    * equi-joins and bounded windows. Per-chunk layers are localCheckpointed
    * (executor-block-backed) to truncate the chained lineage; a production
    * loop would instead persist each increment to the bucketed TableLog
    * artifact (the `graphInsertDir` discipline) and resume from it.
    * Chunk extraction pays ONE pass: the corpus is written once
    * partitioned BY the chunk key (one shuffle-free partitioned write),
    * and each batch is a PARTITION-PRUNED read of its own directory — the
    * r18 shape re-filtered the full corpus once per chunk, which at
    * nChunks=64 was 64 full scans for one logical pass (the scan count is
    * probed in GraphAnnScaleProbe's build leg). The staging directory is
    * deleted when the build returns (every layer frame is materialized by
    * then); row order within a chunk is irrelevant — every step of the
    * chain is (dist, id)-ordered and arrival-order-free, which is also
    * what makes the SQL replay possible at all.
    */
  def buildByInsertion(corpus: DataFrame, m: Int,
                       isRep: org.apache.spark.sql.Column, nEntry: Int,
                       nChunks: Int, repRounds: Int, baseRounds: Int,
                       seedChunks: Int = 1, insBeam: Int = 0,
                       chunkKey: String = "gbld"): (DataFrame, DataFrame) = {
    // within-batch blindness scales with |batch| / |graph so far|, so the
    // SEED should be as large as the wall allows (seedChunks of the
    // nChunks equal slices) and each inserted batch stays ONE slice —
    // seedChunks = nChunks/2 keeps every batch ≤ 1/4 of the graph it
    // joins, which is where the recall gauge stops moving
    require(nChunks >= 1, s"nChunks=$nChunks must be >= 1")
    require(seedChunks >= 1 && seedChunks <= nChunks,
      s"seedChunks=$seedChunks outside [1, nChunks=$nChunks]")
    val outDeg = 2 * m
    // efConstruction: build-time beam DEFAULTS to 2× the out-degree cap
    // (FAISS HNSW ships efConstruction=40 vs M=8 in the same spirit) —
    // a from-scratch build leans harder on candidate quality than a
    // trickle insert, and the wider beam is what moved the recall gauge
    val eb = if (insBeam > 0) insBeam else 2 * outDeg
    val spark = corpus.sparkSession
    val slim = corpus.select(col("vec_id"), col("embedding"))
    val chunkIdx = graft.functions.GraftCols.md5Mod(
      concat(col("vec_id").cast("string"), lit(s"|$chunkKey")), nChunks)
    // ONE pass over the corpus: stage it partitioned by the chunk index,
    // then every chunk (and the seed) is a partition-PRUNED read of its
    // own directories — never a re-filter of the full corpus.
    val stage = java.nio.file.Files.createTempDirectory("graft_gbld_chunks").toFile
    try {
      slim.withColumn("__chunk", chunkIdx)
        .write.mode("overwrite").partitionBy("__chunk")
        .parquet(stage.getAbsolutePath)
      val chunked = spark.read.parquet(stage.getAbsolutePath)
      def chunkAt(pred: org.apache.spark.sql.Column) =
        chunked.filter(pred).select(col("vec_id"), col("embedding"))
      val seed = chunkAt(col("__chunk") < seedChunks.toLong).localCheckpoint()
      require(!seed.filter(isRep).isEmpty,
        s"buildByInsertion: the seed ($seedChunks/$nChunks of the corpus) has " +
          "no rep-layer members — lower nChunks or widen the rep predicate " +
          "(batch inserts descend the rep layer, which must exist)")
      val seedBase = edges(seed, m).select("src", "dst", "dist")
      val seedRep  = edges(seed.filter(isRep), m).select("src", "dst", "dist")
      insertChunks(seed, seedBase, seedRep,
        (seedChunks until nChunks).map(c => chunkAt(col("__chunk") === lit(c.toLong))),
        isRep, nEntry, outDeg, eb, repRounds, baseRounds)
      // insertChunks localCheckpoints every layer and corpus frame, so by
      // here nothing references the staged files (the finally can delete)
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
      }
      rm(stage)
    }
  }

  /** The chain half of buildByInsertion, seed-agnostic: fold `batches`
    * into (seedBase, seedRep) through GraphAnn.insertBatch. Exposed so a
    * deployment whose seed would be COMPUTE-bound under the exact kernel
    * (all-pairs is quadratic regardless of the memory wall) can bootstrap
    * from an approximately-built seed instead — e.g. IVF-blocked kNN
    * (assign to sampled cells, exact kNN within each cell via the grouped
    * cogrouped kernel, GraphAnnScaleProbe's construction) — and still run
    * the same deterministic insertion chain over it.
    */
  def insertChunks(seedCorpus: DataFrame, seedBase: DataFrame, seedRep: DataFrame,
                   batches: Seq[DataFrame],
                   isRep: org.apache.spark.sql.Column, nEntry: Int,
                   outDeg: Int, insBeam: Int,
                   repRounds: Int, baseRounds: Int): (DataFrame, DataFrame) = {
    // One repartition per chunk boundary buys what the bucketed artifact
    // buys the search path: within a batch, every beam round joins the
    // SAME layer frame on src (frontier expansion) and the same corpus on
    // vec_id (candidate scoring) — checkpointing them pre-hashed on the
    // join key makes each of those (repRounds + baseRounds + re-rank)
    // joins shuffle only the small frontier side. Measured 3× end-to-end
    // on the 500k build leg (GraphAnnScaleProbe `build`).
    def ckptBy(df: DataFrame, key: String) =
      df.repartition(col(key)).localCheckpoint()
    var old  = ckptBy(seedCorpus.select(col("vec_id"), col("embedding")), "vec_id")
    var base = ckptBy(seedBase.select("src", "dst", "dist"), "src")
    var rep  = ckptBy(seedRep.select("src", "dst", "dist"), "src")
    batches.foreach { b =>
      val batch   = b.select(col("vec_id"), col("embedding"))
      val entries = graft.ann.GraphAnn.entryPoints(old.filter(isRep), nEntry)
      val (bIns, rIns) = graft.ann.GraphAnn.insertBatch(batch, rep, base, entries,
        old, isRep, outDeg = outDeg, insBeam = insBeam,
        repRounds = repRounds, baseRounds = baseRounds)
      base = ckptBy(bIns.incremented.select("src", "dst", "dist"), "src")
      rep  = ckptBy(rIns.incremented.select("src", "dst", "dist"), "src")
      old  = ckptBy(old.unionByName(batch), "vec_id")
    }
    (base, rep)
  }

  /** NN-DESCENT REFINEMENT (r19) — raise a degraded kNN graph's adjacency
    * quality WITHOUT a rebuild (Dong et al., "Efficient k-nearest neighbor
    * graph construction for generic similarity measures", WWW'11 — the
    * standard post-pass every large-scale graph-ANN build runs). The
    * chunk-insertion build's within-batch blindness compounds at scale:
    * the 5M probe's artifact holds only 13.5% of the true top-10 pairs as
    * direct edges (GraphDiagProbe), which caps beam-search recall at ~0.70
    * no matter the width. NN-descent's observation: a neighbor of my
    * neighbor is likely my neighbor — each round, every node scores its
    * UNDIRECTED neighborhood's neighborhood (the local join: u and w both
    * adjacent to a pivot m, in either direction) and keeps its best `m`
    * over {current edges ∪ candidates}.
    *
    * Determinism: reverse lists and neighborhoods are capped by the
    * engine's universal (dist, id) order; every step is a pure function of
    * (edges, corpus, params), so a round replays as closed-form SQL
    * (`ann_graph_refine` oracle-checks one round over the chunk-built
    * fixture graph). `slices` partitions the u-side by keyed md5 ONLY to
    * bound peak shuffle footprint — per-src results are slice-local, so
    * the output is slice-count-invariant (spec-pinned).
    *
    * 100 TB shape: per round, one capped-window reverse pass (edge-table
    * sized), one self-equi-join of the capped neighborhood table (≤
    * N·undCap² candidate pairs — undCap bounds the quadratic, exactly
    * NN-descent's sample rate ρ·K), two corpus equi-joins to score, one
    * per-src top-m window. No broadcast of anything unbounded; every join
    * keys on node id against the bucketed corpus/edge layouts.
    */
  def refine(edgesDf: DataFrame, corpus: DataFrame, m: Int, rounds: Int,
             revCap: Int = 0, undCap: Int = 0, slices: Int = 1): DataFrame = {
    require(rounds >= 1 && slices >= 1, s"rounds=$rounds, slices=$slices")
    val rc = if (revCap > 0) revCap else m
    val uc = if (undCap > 0) undCap else m + rc
    val ws = Window.partitionBy("src").orderBy(col("dist"), col("dst"))
    val corp = corpus.select(col("vec_id"), col("embedding"))
    var cur = graft.GraftCache.stage(
      edgesDf.select("src", "dst", "dist").repartition(col("src")))
    var r = 0
    while (r < rounds) {
      val rev = cur
        .select(col("dst").as("src"), col("src").as("dst"), col("dist"))
        .withColumn("rn", row_number().over(ws)).filter(col("rn") <= rc).drop("rn")
      // undirected neighborhood, (src,dst)-deduped BEFORE the cap (an edge
      // present in both directions must occupy one window slot, not two),
      // then capped at undCap per node — NN-descent's bounded K
      val und = cur.unionByName(rev)
        .groupBy("src", "dst").agg(min("dist").as("dist"))
        .withColumn("rn", row_number().over(ws)).filter(col("rn") <= uc)
        .select("src", "dst")
        .repartition(col("src")).transform(graft.GraftCache.stage)
      val sliceIdx = graft.functions.GraftCols.md5Mod(
        concat(col("src").cast("string"), lit("|grefine")), slices)
      val parts = (0 until slices).map { sl =>
        val lSide = (if (slices == 1) und else und.filter(sliceIdx === sl.toLong))
          .select(col("src").as("u"), col("dst").as("pivot"))
        val cand = lSide
          .join(und.select(col("src").as("pivot"), col("dst").as("w")), "pivot")
          .filter(col("w") =!= col("u"))
          .select(col("u").as("src"), col("w").as("dst")).distinct()
          .join(cur.select("src", "dst"), Seq("src", "dst"), "left_anti")
        val scored = cand
          .join(corp.select(col("vec_id").as("src"), col("embedding").as("se")), "src")
          .join(corp.select(col("vec_id").as("dst"), col("embedding").as("de")), "dst")
          .withColumn("dist", graft.functions.VectorOps.l2Col(col("se"), col("de")))
          .select("src", "dst", "dist")
        val curSlice =
          if (slices == 1) cur else cur.filter(sliceIdx === sl.toLong)
        val out = curSlice.unionByName(scored)
          .withColumn("rn", row_number().over(ws)).filter(col("rn") <= m).drop("rn")
          .repartition(col("src"))
        // slices > 1 exists to BOUND concurrent shuffle state (the 5M probe
        // OOMs without it) — keep those materializations eager so slices
        // run one after another; the single-slice fixture path stages lazily
        if (slices == 1) graft.GraftCache.stage(out) else out.localCheckpoint()
      }
      cur = parts.reduce(_.unionByName(_))
      r += 1
    }
    cur
  }

  /** Persist the kNN edge graph + accessibility index as parquet — the
    * write-once batch artifacts of one corpus version (DESIGN §3b: at 100 TB
    * the graph is a table, not a cache entry; the reference rebuilds its
    * HNSW index per call instead, watermarking.py:287). Edges are written
    * BUCKETED by `src` (hash-bucket file layout + a catalog-declarable
    * bucket spec — Ann.ivfWrite's co-location discipline upgraded to the
    * form Spark's planner can actually USE): a reader registered through
    * `read` exposes HashPartitioning(src) straight off the scan, so every
    * neighbor join — graph-ANN's per-round frontier expansion above all —
    * shuffles only its probe side, never the edge table. The pre-write
    * repartition matches the bucket hash, so each bucket is one file and
    * the sortBy order is trusted on read (no per-round edge-side Sort
    * either). saveAsTable is the only bucket-writing API; the table entry
    * is dropped right after (external: files persist), because the staging
    * path it points at is renamed away by the artifact publish.
    */
  def write(dir: String, edgesDf: DataFrame, aiDf: DataFrame): Unit = {
    graft.ArtifactIO.writeBucketed(
      edgesDf.select(col("src"), col("dst"), col("dist")),
      s"$dir/edges", "src", EdgeBuckets)
    aiDf.select(col("vec_id"), col("ai"))
      .write.mode("overwrite").parquet(s"$dir/ai")
  }

  /** Read a persisted kNN graph back: (edges, accessibility), usable from a
    * cold session. The edge side re-declares the bucket spec as an external
    * table (the bucket metadata lives in the catalog, not the files; the
    * session-local name is keyed by the path so repeat reads reuse it) —
    * a plain spark.read.parquet would silently forget the layout and
    * re-exchange the edge table under every join.
    */
  def read(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    (graft.ArtifactIO.readBucketed(spark, s"$dir/edges",
        "src BIGINT, dst BIGINT, dist DOUBLE", "src", EdgeBuckets),
      spark.read.parquet(s"$dir/ai"))

  def bfs(edgesDf: DataFrame, seeds: DataFrame, maxIter: Int = 50): DataFrame = {
    // Same lineage discipline as `components`: a per-round localCheckpoint
    // (lazy — GraftCache.stage) keeps the frontier/visited plans O(1)-sized
    // across iterations (reliable checkpoint() on a real cluster); the
    // emptiness probe is the materializing action.
    var visited  = graft.GraftCache.stage(seeds.select(col("vec_id")).distinct())
    var frontier = visited
    var i = 0
    var grew = true
    while (grew && i < maxIter) {
      val next = frontier.join(edgesDf, frontier("vec_id") === edgesDf("src"))
        .select(col("dst").as("vec_id")).distinct()
        .join(visited, Seq("vec_id"), "left_anti")
        .transform(graft.GraftCache.stage)
      grew = !next.isEmpty
      if (grew) {
        visited = graft.GraftCache.stage(visited.union(next))
        frontier = next
      }
      i += 1
    }
    visited
  }

  /** Exact mean of the edge lengths internal to `reached` (both endpoints
    * reached), as one (sum_nanos, n) row — the fold-order-free integer
    * nano-sum construction `graph_cluster_stats` uses, so the mean is
    * bit-reproducible with bounded per-task aggregation state. Replaces the
    * round-13 `aggregate(array_sort(collect_list(...)))` fold, whose single
    * aggregation buffer held EVERY internal edge (single-task OOM at 100×).
    */
  def internalEdgeStats(edgesDf: DataFrame, reached: DataFrame): DataFrame = {
    val inner = edgesDf
      .join(reached.select(col("vec_id").as("src")), Seq("src"), "left_semi")
      .join(reached.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
    inner.agg(
      coalesce(sum(floor(col("dist").cast("double") * lit(1.0e9) + lit(0.5))), lit(0L))
        .as("sum_nanos"),
      count(lit(1)).as("n"))
  }
}
