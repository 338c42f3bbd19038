package graft
import graft.ann.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale attribution for the ANN path: brute-force cosine vs the
  * deterministic-IVF index at a 100× corpus (200k vectors, 64-dim; 2k
  * queries — same synthetic keyed-hash vectors as ScaleProbe so runs are
  * reproducible). Prints per-stage wall time (centroid sample, assignment,
  * search per nprobe) and recall@10 vs the brute baseline, answering the
  * 100 TB question directly: search cost must scale with nprobe/nlist —
  * the probed fraction of the corpus — not with N.
  * Run: `sbt "Test/runMain graft.IvfScaleProbe [nCorpus] [nQueries]"`.
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nCorpus  = args.headOption.map(_.toInt).getOrElse(200000)
    val nQueries = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val d = 64
    val gen = udf((id: Long) => Array.tabulate(d)(j =>
      (graft.functions.Hashing.unitUniform(s"$id/$j").toFloat - 0.5f)))
    val corpus = spark.range(nCorpus)
      .select(col("id").as("vec_id"), gen(col("id")).as("embedding")).cache()
    val queries = spark.range(nQueries)
      .select(col("id").as("vec_id"), gen(col("id") + 1000000).as("embedding")).cache()
    corpus.count(); queries.count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfscale] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // brute baseline: every (query, corpus) pair scored — the N-proportional cost
    val exact = time("brute top-10") {
      Ann.bruteCosine(queries, corpus, 10, kernel = "fold")
        .select("query_id", "neighbor_id", "rank").localCheckpoint()
    }
    val nlist = 256
    val centroids = time(s"centroid sample ($nlist)") {
      Ann.ivfDetCentroids(corpus, nlist)
    }
    val assigned = time("assign (one pass)") {
      val a = Ann.ivfDetAssign(corpus, centroids).localCheckpoint()
      a.count(); a
    }
    for (nprobe <- Seq(1, 4, 16, 64)) {
      val (dt, recall) = {
        val t0 = System.nanoTime()
        val approx = Ann.ivfDetSearch(queries, assigned, centroids, 10, nprobe)
          .select("query_id", "neighbor_id", "rank").localCheckpoint()
        val dt = (System.nanoTime() - t0) / 1e9
        val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
        (dt, hits.toDouble / (nQueries * 10L))
      }
      println(f"[ivfscale] search nprobe=$nprobe%-3d       $dt%8.2f s  recall@10=$recall%.3f")
    }
    // REFINE GAUGE — the centroid-quality knob (Ann.lloydRefine): recall
    // and cell balance vs (nlist, steps) at a fixed probe FRACTION
    // (nprobe = nlist/8, so every row probes ~1/8 of the corpus and the
    // comparison isolates centroid quality from probe budget). A sampled
    // quantizer's worst failure mode is an oversized cell (its scan cost
    // rides the skew guard) and a lopsided recall; Lloyd steps buy balance
    // at one assign pass + one (nlist × d)-row aggregate each.
    val nG = math.min(nQueries, 500)
    val gaugeQ = queries.limit(nG).localCheckpoint()
    val exactG = exact.join(gaugeQ.select(col("vec_id").as("query_id")), Seq("query_id"), "left_semi")
      .localCheckpoint()
    for (nlist <- Seq(16, 64, 256); steps <- Seq(0, 1, 3)) {
      val t0 = System.nanoTime()
      val cents = Ann.lloydRefine(corpus, Ann.ivfDetCentroids(corpus, nlist), steps)
      val tRef = (System.nanoTime() - t0) / 1e9
      val assignedR = Ann.ivfDetAssign(corpus, cents).persist()
      val sizes = assignedR.groupBy("cluster").count()
        .collect().map(_.getLong(1))
      val maxOverMean = sizes.max.toDouble / (nCorpus.toDouble / nlist)
      val nprobe = math.max(1, nlist / 8)
      val approx = Ann.ivfDetSearch(gaugeQ, assignedR, cents, 10, nprobe)
        .select("query_id", "neighbor_id")
      val hits = approx.join(exactG, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[ivfrefine] nlist=$nlist%-3d steps=$steps nprobe=$nprobe%-2d " +
        f"recall@10=${hits.toDouble / (nG * 10L)}%.3f  cells=${sizes.length}%-3d " +
        f"maxcell/mean=$maxOverMean%.2f  refine=$tRef%.1f s")
      assignedR.unpersist()
      System.gc() // nudge the ContextCleaner: each variant's 1+ GB broadcast
    }
    spark.stop()
  }
}
