package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts for the shapes that matter at 100 TB: dimension
  * joins must broadcast, filters/projections must reach the parquet scans,
  * the kNN kernel must stay map-only, and no query may degrade to a
  * cartesian product.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, TestSpark.sf0001).queryExecution.executedPlan.toString

  test("TPC-H dimension joins broadcast and nothing goes cartesian") {
    for (q <- Seq("q3_shipping", "q5_region_revenue", "q10_returned")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast joins")
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
    }
  }

  test("filters and projections push down to the parquet scans") {
    val p = plan("q3_shipping")
    assert(p.contains("PushedFilters: [IsNotNull"), "no pushed filters on scans")
    val scan = p.linesIterator.find(l => l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(scan.nonEmpty, "no lineitem scan in plan")
    assert(!scan.get.contains("l_comment"), "lineitem scan reads unreferenced columns")
  }

  test("the exact kNN kernel is map-only — no join operator, no shuffle beyond the query repartition") {
    val p = plan("knn_topk_sample")
    for (op <- Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "CartesianProduct"))
      assert(!p.contains(op), s"kNN kernel plan contains $op")
  }

  test("jaccard similarity join stays keyed — no cartesian, no all-pairs") {
    val p = plan("dedup_jaccard_pairs")
    assert(!p.contains("CartesianProduct"), "jaccard join degraded to a cartesian")
    assert(p.contains("Join"), "jaccard lost its inverted-index join")
  }

  test("contamination screen: benchmark side broadcasts, text scan is pruned") {
    val p = plan("text_contamination")
    assert(p.contains("BroadcastHashJoin"), "benchmark shingle set must broadcast")
    assert(!p.contains("CartesianProduct"), "contamination degraded to a cartesian")
    // other suites may have cached the documents relation (CacheManager
    // substitutes InMemoryTableScan globally, and its rendering embeds the
    // original FULL-column FileScan — pruning then happens at the cache
    // scan, not the file scan); assert file-scan pruning only uncached
    if (!p.contains("InMemoryTableScan"))
      p.linesIterator.find(_.contains("FileScan parquet")).foreach { scan =>
        assert(!scan.contains("n_chars"), "documents scan reads unreferenced columns")
      }
  }

  test("crossNearDups: benchmark side broadcasts by default, exchanges in large mode") {
    import org.apache.spark.sql.functions._
    val docs  = Tables.documents(spark, TestSpark.sf0001)
    val corp  = docs.filter(pmod(col("doc_id"), lit(100)) =!= 7)
    val bench = docs.filter(pmod(col("doc_id"), lit(100)) === 7)
    val small = graft.text.Dedup.crossNearDups(corp, bench, 0.5)
      .queryExecution.executedPlan.toString
    assert(small.contains("BroadcastHashJoin"), "default mode must broadcast the benchmark bands")
    val large = graft.text.Dedup.crossNearDups(corp, bench, 0.5, broadcastBench = false)
      .queryExecution.executedPlan.toString
    assert(large.contains("ShuffledHashJoin"),
      "large mode must shuffle-hash-join the band keys (no broadcast bound)")
    assert(!large.contains("CartesianProduct") && !small.contains("CartesianProduct"))
  }

  test("deterministic ANN paths never go cartesian; IVF search is join-free") {
    // LSH keeps its bucket-key candidate join; IVF search is the grouped
    // broadcast kernel — its inverted-list scan must appear as a map-only
    // MapPartitions, never as a row join shuffling embedding vectors
    // ann_lsh_topk builds its bucket join per consumer (only the hashed
    // corpus is memoized), so the registered query plan carries the join
    val lsh = plan("ann_lsh_topk")
    assert(!lsh.contains("CartesianProduct"), "ann_lsh_topk has a cartesian product")
    assert(lsh.contains("Join"), "ann_lsh_topk lost its candidate join")
    val ivf = plan("ann_ivf_topk")
    assert(!ivf.contains("CartesianProduct"), "ann_ivf_topk has a cartesian product")
    assert(!ivf.contains("Join"), "ann_ivf_topk regressed to the probed row join " +
      "(shuffles |Q|·nprobe·listSize full vectors — see ivfDetSearch scaladoc)")
    assert(ivf.contains("MapPartitions"), "ann_ivf_topk lost the grouped kernel scan")
  }

  test("text_top_tokens: top-k via TakeOrderedAndProject, no global sort materializes") {
    val p = plan("text_top_tokens")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k cut must be per-partition TakeOrderedAndProject, not sort+limit")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "token counts lost map-side partial aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("corpus_mix: 1-row total broadcasts; sample_stratified filter is map-side") {
    val mix = plan("corpus_mix")
    assert(mix.contains("BroadcastNestedLoopJoin") || mix.contains("BroadcastExchange"),
      "the 1-row token total must broadcast, not shuffle")
    assert(!mix.contains("CartesianProduct"))
    val strat = plan("sample_stratified")
    assert(!strat.contains("Join"), "keyed sampling must not plan a join")
    // the keyed-hash sample filter must run before the report aggregation's
    // shuffle: anchor on the hashpartitioning Exchange the groupBy plans and
    // the Filter carrying the md5 sample predicate (not just any
    // Filter/Exchange substring), then check text order — the plan prints
    // top-down, so "below the exchange" means a LARGER line index
    val lines = strat.linesIterator.toVector
    val exch = lines.indexWhere(l =>
      l.contains("Exchange hashpartitioning") && l.contains("lang"))
    val filt = lines.indexWhere(l => l.contains("Filter") && l.contains("md5"))
    assert(exch >= 0, "report groupBy lost its hashpartitioning exchange")
    assert(filt >= 0, "md5 sample predicate no longer plans as a Filter")
    assert(filt > exch, "sample filter should sit below the report exchange")
  }

  test("pack_sequences small regime: one source-partitioned window, no extra shuffle") {
    val p = plan("pack_sequences")
    assert(p.contains("Window"), "packing lost its prefix-sum window")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"))
  }

  test("pack_sequences distributed regime: no single-partition-per-source sort") {
    // force the big-data path and assert the cumsum window partitions by
    // (source, bucket), never source alone — a source-alone window is the
    // 100 TB single-task wall the dual regime exists to avoid
    spark.conf.set("graft.rank.smallMaxRows", "0")
    try {
      val p = plan("pack_sequences")
      val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toVector
      assert(winLines.nonEmpty, "distributed packing lost its window")
      val cum = winLines.filter(_.contains("tk"))
      assert(cum.nonEmpty, "no cumsum window over tk in the distributed plan")
      assert(cum.forall(_.contains("__b_cum")),
        "distributed cumsum window must partition by (source, __b_cum), not source alone")
      assert(p.contains("BroadcastHashJoin"), "bucket offsets must broadcast back")
    } finally spark.conf.unset("graft.rank.smallMaxRows")
  }

  test("text_surprisal vocab join is dual-regime: broadcast small, shuffle above the knob") {
    val small = plan("text_surprisal")
    assert(small.contains("BroadcastHashJoin"),
      "fixture regime should broadcast the (tiny) vocab")
    spark.conf.set("graft.rank.smallMaxRows", "0")
    try {
      val big = plan("text_surprisal")
      assert(!big.contains("BroadcastHashJoin"),
        "above the knob the unbounded vocab must NOT broadcast " +
          "(a 100 TB corpus vocabulary is 10⁸–10⁹ types — driver OOM)")
      assert(big.contains("SortMergeJoin"), "big regime lost its shuffle token join")
    } finally spark.conf.unset("graft.rank.smallMaxRows")
  }

  test("text_surprisal regime gate keys on vocab cardinality, not doc count (few huge docs)") {
    import org.apache.spark.sql.functions._
    val sc = spark
    import sc.implicits._
    // 3 documents × 4000 distinct tokens each: a doc-count proxy calls this
    // corpus "small" (3 ≤ any knob) and would broadcast a 12k-type vocab;
    // the HLL vocab gate must pick the shuffle join once the knob sits
    // under the TYPE count — the few-but-enormous-documents corner
    val dir = java.nio.file.Files.createTempDirectory("graft_fewhuge").toString
    (0 until 3).map { d =>
      (d.toLong, (0 until 4000).map(t => s"w${d}_$t").mkString(" "), "en", "s0", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.conf.set("graft.rank.smallMaxRows", "5000")
    try {
      val p = SparkEntry.queries("text_surprisal")(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        "a 12k-type vocab over a 5k knob must NOT broadcast just because " +
          "the corpus has 3 documents")
      assert(p.contains("SortMergeJoin"), "few-huge-docs regime lost its shuffle token join")
    } finally spark.conf.unset("graft.rank.smallMaxRows")
  }

  test("text_surprisal_topk: broadcast bounded by K in ANY regime, top-K without global sort") {
    spark.conf.set("graft.rank.smallMaxRows", "0")
    try {
      val p = plan("text_surprisal_topk")
      assert(p.contains("TakeOrderedAndProject"),
        "top-K vocab cut must be map-side TakeOrderedAndProject, not sort+limit")
      assert(p.contains("BroadcastHashJoin"),
        "the K-row vocab should broadcast — that bound is the variant's point")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        "no unbounded shuffle join should remain in the bounded-broadcast variant")
    } finally spark.conf.unset("graft.rank.smallMaxRows")
  }

  test("text_quality_flags: one documents scan, map-side stats, single small exchange") {
    val p = plan("text_quality_flags")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"))
    // per-doc stats are one UDF pass; the only exchange is the 1-row
    // report aggregate's partial→final shuffle
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges <= 1, s"repetition flags should shuffle once, saw $exchanges")
    if (!p.contains("InMemoryTableScan")) {
      val scans = p.linesIterator.count(_.contains("FileScan parquet"))
      assert(scans == 1, s"repetition flags must scan documents once, saw $scans")
    }
  }

  test("embed_pq: map-only assignment over a broadcast codebook — no join, no shuffle agg") {
    val p = plan("embed_pq")
    for (op <- Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "CartesianProduct"))
      assert(!p.contains(op), s"embed_pq plan contains $op — assignment must stay map-only")
  }

  test("pipeline_doc_manifest: signal joins stay keyed, nothing goes cartesian") {
    val p = plan("pipeline_doc_manifest")
    assert(!p.contains("CartesianProduct"), "manifest degraded to a cartesian")
    assert(p.contains("Join"), "manifest lost its per-doc signal joins")
  }

  test("profile_columns: one scan, unpivot-first two-level aggregation, no Expand") {
    val p = plan("profile_columns")
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem"))
    val cached = p.contains("InMemoryTableScan") // another suite may have cached it
    assert(cached || scans == 1, s"profiler must scan lineitem exactly once, saw $scans")
    assert(!p.contains("Expand"),
      "profiler regressed to the multi-countDistinct Expand plan " +
        "(3× slower — groups by all value columns at once; see ProfileProbe)")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "profiler should be a pure aggregation plan")
  }

  test("text_bm25_topk: postings materialize once, small frames broadcast, no cartesian beyond the 1-row stats") {
    val p = plan("text_bm25_topk")
    // the postings frame is localCheckpointed: its consumers read the
    // checkpointed RDD, so the scan+explode subtree appears at most once in
    // the executed plan (the stats scan is a separate map-side pass)
    val gens = p.linesIterator.count(_.trim.startsWith("Generate explode"))
    assert(gens == 0, s"postings subtree re-planned past the checkpoint ($gens explodes)")
    assert(p.contains("BroadcastHashJoin"), "df/query joins must broadcast")
    assert(!p.contains("SortMergeJoin"), "no BM25 frame is big enough to sort-merge")
  }

  test("dedup_span_ngrams: spans shuffle as md5 keys, never gram text; no cartesian") {
    val p = plan("dedup_span_ngrams")
    assert(!p.contains("CartesianProduct"), "span dedup degraded to a cartesian")
    // the only exchanges are on the 16-byte key, the doc id, or the rollup —
    // no exchange may carry the token array or a reconstructed gram string
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, "expected keyed exchanges")
    exchanges.foreach { e =>
      assert(!e.contains("concat_ws") && !e.contains("slice"),
        s"an exchange carries gram text, not its hash: $e")
    }
  }

  test("q_events_pruned: the date range prunes at the scan as PartitionFilters") {
    val p = plan("q_events_pruned")
    val scan = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(scan.nonEmpty, "partitioned scan lost its PartitionFilters")
    assert(scan.get.contains("day"), s"date range must prune on the partition column: ${scan.get}")
    // the range must NOT survive as a post-scan data filter — that would
    // mean every partition is listed and rows filtered late (the scan
    // renders on one line, so slice out the segments after PartitionFilters)
    val pushed = scan.get.split("PushedFilters:").lift(1).getOrElse("")
    assert(!pushed.contains("day"), s"day predicate leaked into the data scan: $pushed")
  }

  test("ann_ivfadc_topk: trained-index composite stays keyed — no cartesian, kernel regime") {
    val p = plan("ann_ivfadc_topk")
    assert(!p.contains("CartesianProduct"), "IVFADC degraded to a cartesian")
    // fixture regime: the probed scan rides the grouped broadcast kernel
    // (map-side), so no shuffle JOIN should appear in the search plan —
    // the recon pass is map-only over broadcast codebooks
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "IVFADC search should be the grouped broadcast kernel at fixture scale")
  }

  test("q_bloom_join: the runtime Bloom filter reaches the fact scan") {
    val p = plan("q_bloom_join")
    assert(p.contains("might_contain"),
      "no runtime Bloom filter on the fact side — every non-matching row " +
        "rides the shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_events_skew_join: the join runs on (key, salt) in the merge regime") {
    val p = plan("q_events_skew_join")
    assert(!p.contains("CartesianProduct"), "salted join degraded to a cartesian")
    assert(p.contains("__salt"),
      "the salt column vanished from the join plan — the hot keys ride one task again")
    assert(p.contains("SortMergeJoin"),
      "the modeled big-dim regime should plan a shuffle merge join")
  }

  test("q_events_asof_join: join-free single-exchange union+window shape") {
    val p = plan("q_events_asof_join")
    assert(!p.contains("Join"),
      "the as-of query planned a join node — the union+window form is gone")
    assert(p.contains("Window"), "the running-last window vanished")
  }

  test("q_events_range_join: containment runs as an equi-join on the bin key") {
    val p = plan("q_events_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the range join degraded to a nested loop")
    assert(p.contains("__bin"), "the bin key vanished from the join")
  }

  test("profile_distinct_kmv: bottom-k selection pre-prunes map-side") {
    val p = plan("profile_distinct_kmv")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      "no map-side top-k prune before the group exchange — the sketch " +
        "would ship whole distinct sets into single sort tasks")
    assert(!p.contains("CartesianProduct"))
  }

  test("text_heavy_hitters_cms: the sketch side broadcasts, nothing goes cartesian") {
    val p = plan("text_heavy_hitters_cms")
    assert(p.contains("BroadcastHashJoin"),
      "the d·w-cell sketch must broadcast into the probe join")
    assert(!p.contains("CartesianProduct"))
  }

  test("graph_triangles: wedge-close stays equi-keyed, no nested loop") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the triangle joins degraded to a nested loop")
  }

  test("graph_pagerank: rank flow stays keyed — no nested loop in any round") {
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "a PageRank round degraded to a nested loop")
    assert(p.contains("Scan parquet") || p.contains("FileScan"),
      "the edge side should come from the persisted bucketed artifact")
  }

  test("q_events_pivot: explicit values → no distinct-values job, two-stage agg") {
    val p = plan("q_events_pivot")
    // Spark's pivot plans (user, type) pre-aggregation + pivotfirst over
    // user: exchange 2 carries only |users|·|types| rows. An IMPLICIT pivot
    // would additionally run a separate collect job for the distinct type
    // values before this plan even exists — the explicit list keeps the
    // whole query one job, which is what this pins (pivotfirst sees the
    // five literals).
    assert(p.contains("pivotfirst(event_type") && p.contains("click, error"),
      "the explicit pivot value list vanished from the plan")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 2,
      s"expected the pre-agg + pivot exchanges, saw $hashEx")
  }

  test("q_events_rollup: grouping sets expand before one shared exchange") {
    val p = plan("q_events_rollup")
    assert(p.contains("Expand"), "rollup lost its grouping-set expansion")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1,
      s"all three aggregation levels must share one exchange, saw $hashEx")
  }

  test("q_events_cube: the full lattice shares one exchange too") {
    val p = plan("q_events_cube")
    assert(p.contains("Expand"), "cube lost its grouping-set expansion")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1,
      s"all four grouping sets must share one exchange, saw $hashEx")
  }

  test("q_events_dpp: the dim join prunes the fact scan via dynamic partition pruning") {
    val p = plan("q_events_dpp")
    val scan = p.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("graft_eventsbydate"))
    assert(scan.nonEmpty, "no partitioned events scan in the DPP plan")
    assert(scan.get.contains("dynamicpruning"),
      s"the weekend-dim join must reach the scan as a dynamicpruning partition " +
        s"filter — a post-scan join filter reads all 30 day directories: ${scan.get}")
    assert(p.contains("BroadcastHashJoin"), "the 9-row day dim must broadcast")
  }

  test("q_events_smb_join: zero-exchange, zero-sort merge join over bucket-sorted scans") {
    val p = plan("q_events_smb_join")
    assert(p.contains("SortMergeJoin"), "the SMB join lost its merge join")
    assert(p.contains("Bucketed: true"), "a side lost its bucketed scan")
    assert(!p.contains("Exchange hashpartitioning"),
      s"an exchange crept under the SMB join — the bucket layout must satisfy " +
        s"the join's distribution:\n$p")
    // per-partition sorts render as "Sort [...], false, 0"; the only sort
    // allowed is the final global orderBy ("true, 0" over rangepartitioning)
    val partSorts = p.linesIterator.count(l => l.contains("Sort [") && l.contains(", false, 0"))
    assert(partSorts == 0,
      s"$partSorts per-partition sorts crept in — the buckets' SORTED BY must feed " +
        s"the merge directly:\n$p")
  }

  test("q_events_zorder: both 2-D predicates reach the clustered scan as pushed filters") {
    val p = plan("q_events_zorder")
    val scan = p.linesIterator.find(l =>
      l.contains("FileScan parquet") && l.contains("graft_eventszorder"))
    assert(scan.nonEmpty, s"no z-ordered artifact scan in the plan:\n$p")
    assert(scan.get.contains("LessThan(user_id,8"),
      s"the user predicate must reach the scan (row-group pruning needs it): ${scan.get}")
    assert(scan.get.contains("GreaterThanOrEqual(ts_ns"),
      s"the time predicate must reach the scan: ${scan.get}")
  }

  test("q_events_interval_overlap: the overlap join is bin-keyed, never a nested loop") {
    val p = plan("q_events_interval_overlap")
    assert(p.contains("__bin"), "the overlap join lost its bin key")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval overlap degraded to a nested loop:\n$p")
  }

  test("q_events_range_left: the naive LEFT theta-join fires the rewrite, no nested loop") {
    val p = plan("q_events_range_left")
    assert(p.contains("__binp"),
      "the optimizer rule's bin key is missing — the left containment join " +
        "ran as a nested loop over |events|·|incidents|")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"nested loop survived the rewrite:\n$p")
  }

  test("q_events_scd2: the point-in-time join is keyed on (user, bin), never a nested loop") {
    val p = plan("q_events_scd2")
    val hashJoin = p.linesIterator.find(l =>
      (l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("__bin"))
    assert(hashJoin.nonEmpty,
      s"the validity join must hash-join on (user_id, __bin):\n$p")
    assert(hashJoin.get.contains("user_id"), s"lost the user key: ${hashJoin.get}")
    assert(!p.contains("CartesianProduct"), "SCD2 join degraded to a cartesian")
    // the only nested loop allowed is the 1-row max(ts) scalar attach (a
    // broadcast parameter frame, Cross by construction) — the containment
    // join itself must never be one
    p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).foreach { l =>
      assert(l.contains("Cross"),
        s"a non-scalar nested loop crept into the SCD2 plan: $l")
    }
  }

  test("r15 lake/sample queries keep their plan shapes") {
    // manifest pruning: the day-equality read must resolve exactly ONE
    // directory — the file index seeing more means pruning regressed to a
    // scan-then-filter
    val p1 = plan("q_events_timetravel_pruned")
    assert(p1.contains("InMemoryFileIndex(1 paths)"),
      s"readWhere must resolve one directory for a day-equality predicate:\n$p1")
    // the change feed reads only changed dirs and nets via exceptAll —
    // never a cartesian
    val p2 = plan("q_events_changefeed")
    assert(!p2.contains("CartesianProduct"), "changeFeed degraded to a cartesian")
    // weighted sampling's top-k is per-partition + driver merge
    val p3 = plan("sample_weighted_priority")
    assert(p3.contains("TakeOrderedAndProject"),
      s"the weighted sample must not globally sort the corpus:\n$p3")
    // the mixture sampler broadcasts its |sources|-row quota table
    val p4 = plan("sample_mixture_sqrt")
    assert(!p4.contains("CartesianProduct"), "mixture sampler went cartesian")
  }

  test("r16 data skipping: the ts-range read resolves exactly one directory") {
    // the predicate is a VALUE range (ts_ns), not the partition key — the
    // manifest's per-dir min/max stats must prune every other day's dir
    // before Spark lists it; more paths in the file index means skipping
    // regressed to scan-then-filter
    val p = plan("q_events_stats_pruned")
    assert(p.contains("InMemoryFileIndex(1 paths)"),
      s"per-dir stats must resolve ONE directory for an intra-day ts range:\n$p")
  }

  test("wm_accessibility's population stats are distributed nano-sums — no collect_list buffer") {
    // the r14 parity-mode orderedMean was a collect_list of ALL N rows in
    // one aggregation buffer (single-reducer O(N) array, the last unbounded
    // fold left in the engine); the oracle now replays integer nano-sums,
    // so the SAME distributed plan serves Verify and Bench — gate the
    // buffer out of the executed plan so it can't come back
    // (the per-node avg_edge_len fold keeps its collect_list — that buffer
    // is bounded by the out-degree 2M=16 and grouped by src; the gate is on
    // GLOBAL aggregates, where the buffer would be the whole corpus)
    val p = plan("wm_accessibility")
    p.linesIterator.filter(_.contains("collect_list")).foreach { l =>
      assert(!l.contains("keys=[]"),
        "accessibility's μ/σ must be integer nano-sums, not a collect_list " +
          s"of every node in one global aggregation buffer (single-task OOM at 100×): $l")
    }
    assert(p.contains("HashAggregate"), "expected the partial/final hash aggregate")
  }

  test("graph_bfs_reach's internal-edge mean is a bounded nano-sum — no collect_list buffer") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Seq((1L, 2L, 0.5), (2L, 3L, 0.25)).toDF("src", "dst", "dist")
    val reached = Seq(1L, 2L, 3L).toDF("vec_id")
    val p = graft.graph.KnnGraph.internalEdgeStats(e, reached)
      .queryExecution.executedPlan.toString
    assert(!p.contains("collect_list"),
      "the edge-length fold must be the integer nano-sum, not a collect_list " +
        "buffer of every component-internal edge (single-task OOM at 100×)")
    assert(!p.contains("ObjectHashAggregate") && !p.contains("SortAggregate"),
      s"nano-sum must stay a codegen HashAggregate: $p")
    assert(p.contains("HashAggregate"), "expected the partial/final hash aggregate")
  }

  test("profile_quantiles: the ordered window sees the histogram, not rows") {
    val p = plan("profile_quantiles")
    // the window input must be the (source, n_chars) aggregate — a Window
    // directly over a scan would sort every document row
    val widx = p.linesIterator.indexWhere(l => l.contains("Window ") || l.trim.startsWith("Window"))
    assert(widx >= 0, "expected a cumsum window")
    assert(p.contains("HashAggregate"), "expected the histogram aggregate below the window")
    assert(!p.contains("CartesianProduct"), "quantiles degraded to a cartesian")
  }
}
