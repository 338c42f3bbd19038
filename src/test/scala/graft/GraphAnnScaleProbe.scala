package graft
import graft.ann.GraphAnn
import graft.graph.KnnGraph
import graft.knn.Knn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale attribution for graph-traversal ANN — the one nontrivial kernel
  * that had no synthetic probe (IvfScaleProbe / PackScaleProbe /
  * JaccardScaleProbe cover the others): beam search over a ≥1M-node graph,
  * sweeping rounds R × beam width B, recording recall@10 against the exact
  * baseline and wall time per round (≈ per-round frontier+scoring join
  * cost — the thing that multiplies by R at any corpus size).
  *
  * The graph is built the way a 100 TB deployment would build it —
  * IVF-blocked approximate kNN (assign to √N-ish sampled cells, exact kNN
  * within each cell via the grouped broadcast kernel), NOT an O(N²) pass —
  * then persisted through the BUCKETED artifact writer and read back
  * through the catalog spec, so the sweep exercises the exact per-round
  * join shape production search runs (edge side: bucketed scan, no
  * re-exchange; see GraphAnnSpec's plan gate).
  *
  * Run: `sbt "Test/runMain graft.GraphAnnScaleProbe [nCorpus] [nQueries]"`.
  * Findings recorded in DESIGN.md ("Graph-ANN scale probe").
  */
object GraphAnnScaleProbe {

  /** BUILD-BY-INSERTION leg (`Test/runMain graft.GraphAnnScaleProbe build
    * [nCorpus] [nQueries]`): constructs the layered graph for a corpus
    * whose exact all-pairs build is PAST the broadcast byte wall —
    * the wall is lowered to make the regime boundary explicit at probe
    * scale (the wall is a deployment conf; what matters is the dispatch,
    * same technique as KnnWallSpec). Asserts the exact build fails loudly,
    * then runs KnnGraph.buildByInsertion (seed = 1 of nChunks slices,
    * batches chained through GraphAnn.insertBatch), times each phase, and
    * gauges layered-search recall over the chunk-built artifact against
    * the pre-computed exact ground truth. Findings → DESIGN.md.
    */
  def buildLeg(spark: SparkSession, nCorpus: Int, nQueries: Int,
               saveDir: Option[String] = None): Unit = {
    import graft.functions.GraftCols
    val d = 8
    val m = 8
    val gen = udf((id: Long) => Array.tabulate(d)(j =>
      (graft.functions.Hashing.unitUniform(s"v|$id|$j").toFloat - 0.5f)))
    val corpus = spark.range(nCorpus)
      .select(col("id").as("vec_id"), gen(col("id")).as("embedding"))
      .localCheckpoint()
    val queries = corpus.filter(col("vec_id") < nQueries).cache()
    queries.count()
    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gabuild] $label%-40s $dt%8.2f s"); (r, dt)
    }
    // ground truth BEFORE lowering the wall (it needs the broadcast regime)
    val (exact, _) = time("exact top-10 (brute baseline)") {
      val e = Knn.exact(queries, corpus, 10, kernel = "fast")
        .select("query_id", "neighbor_id").localCheckpoint()
      e.count(); e
    }
    val nExact = exact.count()
    val nChunks = 8
    // wall: the full corpus must NOT fit, the 1/nChunks seed must
    val perRow = d * 4 + 16
    val wall = nCorpus.toLong * perRow / 2
    spark.conf.set("graft.knn.broadcastMaxBytes", wall.toString)
    println(s"[gabuild] wall set to $wall bytes (corpus needs ~${nCorpus.toLong * perRow})")
    val walled =
      try { KnnGraph.edges(corpus, m).count(); false }
      catch { case e: IllegalStateException =>
        println(s"[gabuild] exact build walled as designed: ${e.getMessage.take(80)}…")
        true
      }
    assert(walled, "the exact build should have hit the byte wall")
    val isRep = GraftCols.md5Mod(
      concat(col("vec_id").cast("string"), lit("|grep")), 8) === 0L
    val ((base, rep), buildS) = time(s"buildByInsertion ($nChunks chunks, seed 1)") {
      val r = KnnGraph.buildByInsertion(corpus, m, isRep, 64,
        nChunks = nChunks, repRounds = 2, baseRounds = 2,
        seedChunks = 1, insBeam = 2 * m)
      (r._1.count(), r._2.count()); r
    }
    spark.conf.unset("graft.knn.broadcastMaxBytes")
    println(f"[gabuild] built: base ${base.count()}%,d edges, rep ${rep.count()}%,d edges, " +
      f"${nCorpus / buildS}%,.0f rows/s end-to-end")
    // persist the build so search-width sweeps iterate WITHOUT rebuilding
    // (`sweep <dir>` leg) — a 5M build is tens of minutes, a sweep is not
    saveDir.foreach { dir =>
      corpus.write.mode("overwrite").parquet(s"$dir/corpus")
      exact.write.mode("overwrite").parquet(s"$dir/exact")
      base.select("src", "dst", "dist").write.mode("overwrite").parquet(s"$dir/base")
      rep.select("src", "dst", "dist").write.mode("overwrite").parquet(s"$dir/rep")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/meta.txt"),
        s"$nCorpus $nQueries")
      println(s"[gabuild] artifacts saved to $dir")
    }
    val entries = GraphAnn.entryPoints(corpus.filter(isRep), 64, seed = "gsp-e")
    def gauge(tag: String, baseE: org.apache.spark.sql.DataFrame,
              repE: org.apache.spark.sql.DataFrame): Unit =
      for ((rb, rr, bb, br) <- Seq((16, 4, 16, 8), (32, 4, 32, 8))) {
        val t0 = System.nanoTime()
        val res = GraphAnn.layeredSearch(queries, corpus, repE, baseE,
          entries, k = 10, repBeam = rb, baseBeam = bb,
          repRounds = rr, baseRounds = br)
        val hits = res.select("query_id", "neighbor_id")
          .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[gabuild] $tag%-11s rep B=$rb%-3d R=$rr base B=$bb%-3d R=$br " +
          f"recall@10 ${hits.toDouble / nExact}%7.4f $dt%9.2f s")
      }
    gauge("chunk-built", base, rep)
    // build-quality isolation: the SAME search over the EXACT-built graph
    // (compute-feasible up to ~1M at d=8) — the recall ratio between the
    // two rows is the within-batch-blindness price, with search-width
    // effects cancelled out
    if (nCorpus <= 1000000) {
      val (exBase, t1) = time("exact build (comparison graph)") {
        val b = KnnGraph.edges(corpus, m).select("src", "dst", "dist")
          .repartition(col("src")).localCheckpoint()
        b.count(); b
      }
      val exRep = KnnGraph.edges(corpus.filter(isRep), m)
        .select("src", "dst", "dist").repartition(col("src")).localCheckpoint()
      println(f"[gabuild] exact build throughput ${nCorpus / t1}%,.0f rows/s")
      gauge("exact-built", exBase, exRep)
    }
  }

  /** NN-DESCENT REFINE leg (`Test/runMain graft.GraphAnnScaleProbe refine
    * <dir> <rounds> [slices]`): refines the saved base layer round by
    * round, printing the direct-edge recall of the exact top-10 after
    * each (the graph-quality number GraphDiagProbe reads — the thing the
    * refine exists to raise), and saves each round's layer as
    * `<dir>/baseR<k>` for `sweep … baseR<k>`.
    */
  def refineLeg(spark: SparkSession, dir: String, rounds: Int, slices: Int): Unit = {
    // the local join shuffles ~N·undCap² candidate rows — at 5M that is
    // ~1.3B per slice-round, and 32 shuffle partitions put ~40M rows in
    // one distinct task (OOM at 28g). A cluster sizes this with its
    // parallelism; locally the probe widens it for the refine only.
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    val corpus = spark.read.parquet(s"$dir/corpus").localCheckpoint()
    val exact  = spark.read.parquet(s"$dir/exact").localCheckpoint()
    val nExact = exact.count()
    val m = 16 // the saved artifacts' out-degree (2M at M=8)
    var cur = spark.read.parquet(s"$dir/base")
    def edgeRecall(e: org.apache.spark.sql.DataFrame): Double =
      exact.join(e.select("src", "dst"),
        exact("query_id") === col("src") && exact("neighbor_id") === col("dst"),
        "left_semi").count().toDouble / nExact
    println(f"[grefine] round 0 direct-edge recall ${edgeRecall(cur)}%.4f")
    (1 to rounds).foreach { k =>
      val t0 = System.nanoTime()
      cur = KnnGraph.refine(cur, corpus, m, rounds = 1, slices = slices)
      val dt = (System.nanoTime() - t0) / 1e9
      cur.write.mode("overwrite").parquet(s"$dir/baseR$k")
      cur = spark.read.parquet(s"$dir/baseR$k")
      println(f"[grefine] round $k direct-edge recall ${edgeRecall(cur)}%.4f " +
        f"(${cur.count()}%,d edges, $dt%8.1f s)")
    }
  }

  /** SEARCH-WIDTH SWEEP over a SAVED build (`Test/runMain
    * graft.GraphAnnScaleProbe sweep <dir> [beamsCsv] [baseName]`): loads
    * the artifacts `build … <dir>` persisted (or a `refine` leg's
    * `baseR<k>` layer) and gauges layered-search recall at a ladder of
    * widths INCLUDING the GraphAnn.efSearch/searchRounds schedule row —
    * the round-19 question: does the scheduled width hold recall ≥ 0.9
    * where the r18 fixed beams (16/32) read 0.55/0.62? Also sweeps the
    * entry count (multi-seed descent) at the scheduled width to separate
    * entry starvation from beam starvation.
    */
  def sweepLeg(spark: SparkSession, dir: String, widths: Seq[Int],
               baseName: String = "base"): Unit = {
    import graft.functions.GraftCols
    val Array(nCorpus, nQueries) = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$dir/meta.txt")).trim.split(" ").map(_.toInt)
    val corpus = spark.read.parquet(s"$dir/corpus").localCheckpoint()
    val exact  = spark.read.parquet(s"$dir/exact").localCheckpoint()
    val base   = spark.read.parquet(s"$dir/$baseName")
      .repartition(col("src")).localCheckpoint()
    val rep    = spark.read.parquet(s"$dir/rep")
      .repartition(col("src")).localCheckpoint()
    val queries = corpus.filter(col("vec_id") < nQueries).cache()
    queries.count()
    val nExact = exact.count()
    val isRep = GraftCols.md5Mod(
      concat(col("vec_id").cast("string"), lit("|grep")), 8) === 0L
    val m = 8
    val nRep = corpus.filter(isRep).count()
    val k = 10
    val efBase = GraphAnn.efSearch(nCorpus, k)
    val efRep  = GraphAnn.efSearch(nRep, k)
    val rBase  = GraphAnn.searchRounds(nCorpus, 2 * m)
    val rRep   = GraphAnn.searchRounds(nRep, 2 * m)
    println(s"[gasweep] N=$nCorpus nRep=$nRep schedule: rep B=$efRep R=$rRep " +
      s"base B=$efBase R=$rBase (r18 fixed rows: 16/32)")
    def gauge(tag: String, nEntry: Int, rb: Int, rr: Int, bb: Int, br: Int): Unit = {
      val entries = GraphAnn.entryPoints(corpus.filter(isRep), nEntry, seed = "gsp-e")
      val t0 = System.nanoTime()
      val res = GraphAnn.layeredSearch(queries, corpus, rep, base,
        entries, k = k, repBeam = rb, baseBeam = bb,
        repRounds = rr, baseRounds = br)
      val hits = res.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gasweep] $tag%-10s E=$nEntry%-4d rep B=$rb%-4d R=$rr base B=$bb%-4d R=$br " +
        f"recall@10 ${hits.toDouble / nExact}%7.4f $dt%9.2f s")
    }
    // r18 carry rows (fixed beams) for trend continuity, then the width
    // ladder at scheduled rounds, the schedule row, and the entry sweep
    gauge("r18-fixed", 64, 16, 4, 16, 8)
    for (b <- widths) gauge("ladder", 64, math.min(b, efRep), rRep, b, rBase)
    gauge("schedule", 64, efRep, rRep, efBase, rBase)
    for (e <- Seq(256, 1024)) gauge("entries", e, efRep, rRep, efBase, rBase)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      // the build leg is a long chain of shuffle-heavy rounds whose files
      // are reclaimed only AFTER a GC notifies the ContextCleaner — with a
      // large heap full GCs can be 30+ min apart (the default periodicGC
      // interval), and the 5M build accumulated ~10 GB/round of dead
      // shuffle files past free disk before the first cleanup (missing
      // shuffle-index/broadcast errors). One forced GC a minute bounds the
      // dead-file window at roughly one round's worth.
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("build")) {
      val n  = args.drop(1).headOption.map(_.toInt).getOrElse(5000000)
      val nq = args.drop(2).headOption.map(_.toInt).getOrElse(100)
      buildLeg(spark, n, nq, args.drop(3).headOption)
      spark.stop(); return
    }
    if (args.headOption.contains("sweep")) {
      val dir = args(1)
      val widths = args.drop(2).headOption
        .map(_.split(',').map(_.trim.toInt).toSeq).getOrElse(Seq(64, 141))
      sweepLeg(spark, dir, widths, args.drop(3).headOption.getOrElse("base"))
      spark.stop(); return
    }
    if (args.headOption.contains("refine")) {
      refineLeg(spark, args(1), args.drop(2).headOption.map(_.toInt).getOrElse(2),
        args.drop(3).headOption.map(_.toInt).getOrElse(4))
      spark.stop(); return
    }
    val nCorpus  = args.headOption.map(_.toInt).getOrElse(1000000)
    val nQueries = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val d = 8
    val m = 8 // out-degree of the synthetic graph
    // uniform keyed-hash vectors (same family as ScaleProbe/IvfScaleProbe)
    // at a moderate dimension: tight synthetic CLUSTERS were tried first
    // and fragment the kNN graph into per-cluster cliques no beam can
    // navigate (recall ≈ 0 at any R — see DESIGN 3c), which says something
    // true about graph ANN (it needs a continuous manifold or pruned long
    // edges) but measures the fixture, not the search
    val gen = udf((id: Long) => Array.tabulate(d)(j =>
      (graft.functions.Hashing.unitUniform(s"v|$id|$j").toFloat - 0.5f)))
    val corpus = spark.range(nCorpus)
      .select(col("id").as("vec_id"), gen(col("id")).as("embedding"))
      .localCheckpoint()
    val queries = corpus.filter(col("vec_id") < nQueries).cache()
    queries.count()
    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gascale] $label%-34s $dt%8.2f s"); (r, dt)
    }
    // exact ground truth: one broadcast-kernel pass (N-proportional — the
    // cost the graph index exists to avoid per query batch)
    val (exact, _) = time("exact top-10 (brute baseline)") {
      val e = Knn.exact(queries, corpus, 10, kernel = "fast")
        .select("query_id", "neighbor_id").localCheckpoint()
      e.count(); e
    }
    val nExact = exact.count()
    // IVF-blocked approximate kNN graph (cell-local exact kNN) PLUS keyed
    // random long-range links — the NSW construction: cell-local edges
    // alone leave ~|clusters| disconnected cliques (a beam can only search
    // components its entries touch — measured recall ≈ 0 without the long
    // links), while a few uniform shortcuts per node give the greedy
    // descent its navigability, which is exactly why HNSW keeps upper
    // layers and Vamana keeps pruned long edges
    val nlist = 1024
    val nLong = 2
    val mRep  = 8
    val (graphDir, _) = time(s"graph build (cell kNN + rep layer + $nLong NSW links)") {
      // cell representatives = the keyed sample rows themselves (with ids)
      val repRows = corpus
        .orderBy(md5(concat(lit("gsp|"), col("vec_id").cast("string"))), col("vec_id"))
        .limit(nlist).select("vec_id", "embedding").collect()
      val repIds = repRows.map(_.getLong(0))
      val cents  = repRows.map(_.getSeq[Float](1).toArray)
      val assigned = graft.ann.Ann.ivfDetAssign(corpus, cents).localCheckpoint()
      // level 0: cell-local exact kNN (the IVF-blocked distributed build)
      val local = Knn.exactGrouped(assigned, assigned, m + 1, "cluster", kernel = "fast")
        .filter(col("neighbor_id") =!= col("query_id"))
        .filter(col("rank") <= m)
        .select(col("query_id").as("src"), col("neighbor_id").as("dst"), col("dist"))
      // level 1 (the HNSW-upper-layer idea): every node links to its cell's
      // representative, and representatives carry their own kNN graph
      // (driver-side — nlist² distances) — beam descent then navigates the
      // rep layer to the right region and refines through level 0. Without
      // a long-range structure the cell-local graph is ~|cells|
      // disconnected cliques and measured recall is ≈ 0 at any R.
      import spark.implicits._
      val toRep = assigned.select(col("vec_id").as("src"), col("cluster"))
        .join(broadcast(repIds.zipWithIndex
          .map { case (id, c) => (c, id) }.toSeq.toDF("cluster", "dst")), "cluster")
        .filter(col("dst") =!= col("src"))
        .select(col("src"), col("dst"), lit(0.0).as("dist"))
      val repEdges = (for {
        c <- cents.indices
        near <- cents.indices.filter(_ != c)
          .map(c2 => (graft.functions.VectorOps.l2(cents(c), cents(c2)), c2))
          .sorted.take(mRep)
      } yield (repIds(c), repIds(near._2), 0.0)).toSeq.toDF("src", "dst", "dist")
      // plus a couple of uniform NSW shortcuts per node for insurance
      val longUdf = udf((id: Long) =>
        Array.tabulate(nLong)(j => graft.functions.Hashing.md5Mod(s"lr|$id|$j", nCorpus)))
      val longLinks = corpus.select(col("vec_id").as("src"),
          explode(longUdf(col("vec_id"))).as("dst"))
        .filter(col("dst") =!= col("src"))
        .withColumn("dist", lit(0.0)) // beamSearch re-scores; dist unused
      val edges = local.unionByName(toRep).unionByName(repEdges).unionByName(longLinks)
      val dir = java.nio.file.Files.createTempDirectory("graft_gascale").toString
      val ai = assigned.select(col("vec_id"), lit(0.0).as("ai")) // probe needs no AI
      KnnGraph.write(dir, edges, ai)
      dir
    }
    val (edgesArt, _) = KnnGraph.read(spark, graphDir)
    println(s"[gascale] corpus $nCorpus, edges ${edgesArt.count()}, queries $nQueries")
    val entries = GraphAnn.entryPoints(corpus, 64, seed = "gsp-e").cache()
    entries.count()
    println(f"[gascale] ${"R x B"}%-10s ${"recall@10"}%10s ${"total s"}%9s ${"s/round"}%9s")
    for (beam <- Seq(16, 32, 64); rounds <- Seq(1, 2, 4, 8, 12, 16)) {
      val t0 = System.nanoTime()
      val res = GraphAnn.beamSearch(queries, corpus, edgesArt, entries,
        k = 10, beam = beam, rounds = rounds)
      val hits = res.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gascale] R=$rounds%-2d B=$beam%-4d ${hits.toDouble / nExact}%10.4f $dt%9.2f ${dt / math.max(rounds, 1)}%9.2f")
    }

    // LAYERED two-phase search (GraphAnn.layeredSearch): the rep layer as
    // its OWN edge table — phase 1 beams over the 1024-rep kNN graph
    // (tiny, long-range), phase 2 refines on the full base graph from the
    // per-query coarse beam. Compared against the flat search at the SAME
    // reduced base width: the claim under test is that per-query entries
    // from the coarse layer buy back the recall a narrower flat beam
    // loses. Flat controls at B=10 run here (the main sweep covers 16+).
    import spark.implicits._
    val repRows2 = corpus
      .orderBy(md5(concat(lit("gsp|"), col("vec_id").cast("string"))), col("vec_id"))
      .limit(nlist).select("vec_id", "embedding").collect()
    val repIds2 = repRows2.map(_.getLong(0))
    val cents2  = repRows2.map(_.getSeq[Float](1).toArray)
    val repEdges2 = (for {
      c <- cents2.indices
      near <- cents2.indices.filter(_ != c)
        .map(c2 => (graft.functions.VectorOps.l2(cents2(c), cents2(c2)), c2))
        .sorted.take(mRep)
    } yield (repIds2(c), repIds2(near._2), 0.0)).toSeq
      .toDF("src", "dst", "dist").cache()
    repEdges2.count()
    val repEntries = GraphAnn.entryPoints(
      corpus.join(broadcast(repIds2.toSeq.toDF("vec_id")), "vec_id"),
      64, seed = "gsp-e").cache()
    repEntries.count()
    for ((beam, rounds) <- Seq((10, 8), (10, 12))) {
      val t0 = System.nanoTime()
      val res = GraphAnn.beamSearch(queries, corpus, edgesArt, entries,
        k = 10, beam = beam, rounds = rounds)
      val hits = res.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gascale] flat    R=$rounds%-2d B=$beam%-4d ${hits.toDouble / nExact}%10.4f $dt%9.2f")
    }
    for ((rb, rr, bb, br) <- Seq((8, 4, 10, 4), (8, 4, 10, 8), (16, 4, 10, 8))) {
      val t0 = System.nanoTime()
      val res = GraphAnn.layeredSearch(queries, corpus, repEdges2, edgesArt,
        repEntries, k = 10, repBeam = rb, baseBeam = bb,
        repRounds = rr, baseRounds = br)
      val hits = res.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gascale] layered rep B=$rb%-3d R=$rr base B=$bb%-3d R=$br " +
        f"${hits.toDouble / nExact}%10.4f $dt%9.2f")
    }
    spark.stop()
  }
}
