package graft

import graft.graph.KnnGraph
import graft.knn.Knn
import graft.metrics.Metrics
import graft.watermark.{Tvp, WmKey}
import graft.attacks.Attacks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KnnGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb   = Tables.embeddings(spark, TestSpark.sf0001).cache()
  val M = 8

  test("exactGrouped skew guard: split sub-indexes reproduce the unsplit result exactly") {
    // skewed grouped corpus: group 0 dominates (400 rows), group 1 is tiny
    val tagged = emb.withColumn("grp",
      when(col("vec_id") < 400, lit(0.0)).otherwise(lit(1.0)))
      .select(col("grp"), col("vec_id"), col("embedding")).cache()
    val queries = tagged.filter(col("vec_id") % 50 === 0) // few queries → the skewed regime
    val unsplit = Knn.exactGrouped(queries, tagged, 5, "grp", kernel = "fold")
      .orderBy("grp", "query_id", "rank").collect()
    // force the guard: 100-row bound splits group 0 into 4 sub-indexes
    val split = Knn.exactGrouped(queries, tagged, 5, "grp", kernel = "fold", maxIndexRows = 100)
      .orderBy("grp", "query_id", "rank").collect()
    assert(split.length == unsplit.length)
    split.zip(unsplit).foreach { case (a, b) =>
      assert(a.getDouble(0) == b.getDouble(0) && a.getLong(1) == b.getLong(1)
        && a.getLong(2) == b.getLong(2) && a.getInt(4) == b.getInt(4), s"$a vs $b")
      assert(a.getDouble(3) == b.getDouble(3), s"merged dist must stay bit-exact: $a vs $b")
    }
    // the cosine (descending) merge order too
    val unsplitC = Knn.exactGrouped(queries, tagged, 5, "grp", metric = "cosine")
      .orderBy("grp", "query_id", "rank").collect()
    val splitC = Knn.exactGrouped(queries, tagged, 5, "grp", metric = "cosine", maxIndexRows = 100)
      .orderBy("grp", "query_id", "rank").collect()
    assert(splitC.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      == unsplitC.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq)
    // granularity: the hot group's scan now spreads over 4 work units per
    // query instead of one monolithic scan per query
    assert(math.ceil(400.0 / 100).toInt == 4)
    // a query group ABSENT from the corpus contributes no neighbors in
    // EVERY regime — unsplit, split, and cogrouped must all return empty,
    // never throw (the dispatch boundary stays invisible)
    val ghost = queries.withColumn("grp", lit(7.0))
    assert(Knn.exactGrouped(ghost, tagged, 5, "grp").count() == 0,
      "unsplit branch: absent query group must yield no rows")
    assert(Knn.exactGrouped(ghost, tagged, 5, "grp", maxIndexRows = 100).count() == 0,
      "split branch: absent query group must yield no rows, not NoSuchElementException")
    assert(Knn.exactGroupedCogrouped(ghost, tagged, 5, "grp").count() == 0,
      "cogrouped branch: absent query group must yield no rows")
  }

  test("Knn.exact fold kernel is bit-identical to the SQL cross-join plan; fast kernel agrees to FP tolerance") {
    val sub  = emb.filter(col("vec_id") < 60).cache()
    val slow = Knn.sql(sub, sub, 5).orderBy("query_id", "rank").collect()
    val fold = Knn.exact(sub, sub, 5, kernel = "fold").orderBy("query_id", "rank").collect()
    assert(fold.length == slow.length)
    fold.zip(slow).foreach { case (f, s) =>
      assert(f.getLong(0) == s.getLong(0) && f.getLong(1) == s.getLong(1), s"$f vs $s")
      assert(f.getDouble(2) == s.getDouble(2), s"fold kernel must be bit-exact: $f vs $s")
    }
    val fast = Knn.exact(sub, sub, 5).orderBy("query_id", "rank").collect()
    fast.zip(slow).foreach { case (f, s) =>
      assert(f.getLong(0) == s.getLong(0) && f.getLong(1) == s.getLong(1), s"$f vs $s")
      assert(math.abs(f.getDouble(2) - s.getDouble(2)) < 1e-6)
    }
  }

  test("self is rank 1 at dist ~0; ranks are 1..k") {
    val res = Knn.exact(emb, emb, 4).cache()
    val self = res.filter(col("rank") === 1)
    assert(self.filter(col("neighbor_id") =!= col("query_id")).count() == 0)
    assert(self.filter(col("dist") > 1e-6).count() == 0)
    val badRanks = res.groupBy("query_id").agg(collect_list("rank").as("rs"))
      .filter(array_sort(col("rs")) =!= array(lit(1), lit(2), lit(3), lit(4)))
    assert(badRanks.count() == 0)
  }

  test("edges: out-degree exactly 2M, no self loops") {
    val e = GraftCache.memo(s"test-edges") { KnnGraph.edges(emb, M) }
    assert(e.filter(col("src") === col("dst")).count() == 0)
    val deg = e.groupBy("src").count()
    assert(deg.filter(col("count") =!= (2 * M)).count() == 0)
    assert(deg.count() == emb.count())
  }

  test("graph metrics: bidir in [0,2M], avg_edge_len > 0, ai standardized") {
    val e  = GraftCache.memo(s"test-edges") { KnnGraph.edges(emb, M) }
    val be = KnnGraph.bidirectionalEdges(emb, e)
    assert(be.filter(col("bidir_edges") < 0 || col("bidir_edges") > 2 * M).count() == 0)
    val ae = KnnGraph.avgEdgeLength(emb, e)
    assert(ae.filter(isnan(col("avg_edge_len")) || col("avg_edge_len") <= 0).count() == 0)
    val ai = KnnGraph.accessibility(emb, e)
    val stats = ai.agg(avg("ai"), stddev_pop("ai")).head
    assert(math.abs(stats.getDouble(0)) < 1e-9) // mean(z-blend) == 0
    assert(stats.getDouble(1) > 0)
    assert(ai.count() == emb.count())
  }

  test("kNN graph round-trips through parquet persistence bit-for-bit") {
    val e  = GraftCache.memo(s"test-edges") { KnnGraph.edges(emb, M) }
    val ai = KnnGraph.accessibility(emb, e)
    val dir = java.nio.file.Files.createTempDirectory("graft_graph").toFile
    try {
      KnnGraph.write(dir.getAbsolutePath, e, ai)
      val (re, rai) = KnnGraph.read(spark, dir.getAbsolutePath)
      // edges: identical set (src, dst, dist), doubles bit-exact
      val fresh = e.select("src", "dst", "dist").orderBy("src", "dst").collect()
      val back  = re.select("src", "dst", "dist").orderBy("src", "dst").collect()
      assert(back.length == fresh.length)
      back.zip(fresh).foreach { case (a, b) => assert(a == b, s"$a != $b") }
      // accessibility: identical (vec_id, ai)
      val fa = ai.orderBy("vec_id").collect()
      val ba = rai.select("vec_id", "ai").orderBy("vec_id").collect()
      assert(ba.length == fa.length)
      ba.zip(fa).foreach { case (a, b) => assert(a == b, s"$a != $b") }
      // and the persisted graph serves metrics without the kNN pass
      val bd = KnnGraph.bidirectionalEdges(emb, re)
      assert(bd.filter(col("bidir_edges") < 0 || col("bidir_edges") > 2 * M).count() == 0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir).deleteRecursively()
    }
  }

  test("queryCounts: total hits == nQueries * (k - selfHits)") {
    val raw = GraftCache.memo("test-raw") { KnnGraph.rawKnn(emb, 2 * M + 1) }
    val qc  = KnnGraph.queryCounts(emb, raw, k = 10)
    val n   = emb.count()
    val total = qc.agg(sum("query_count")).head.getLong(0)
    val selfIn10 = raw.filter(col("rank") <= 10 && col("neighbor_id") === col("query_id")).count()
    assert(total == n * 10 - selfIn10)
  }

  test("components = first-seed-wins BFS: min reaching seed labels the reached set") {
    import spark.implicits._
    val edges = KnnGraph.edges(emb, M).cache()
    val seeds = Seq(3L, 7L).toDF("vec_id")
    val comps = KnnGraph.components(edges, seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val from3 = KnnGraph.bfs(edges, Seq(3L).toDF("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val from7 = KnnGraph.bfs(edges, Seq(7L).toDF("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(comps.keySet == (from3 ++ from7), "labeled set must equal the BFS-reached union")
    comps.foreach { case (v, c) =>
      val expect = if (from3(v)) 3L else 7L // ascending seed order wins
      assert(c == expect, s"node $v labeled $c, expected $expect")
    }
  }

  test("TVP (accessibility-guided) embed then extract: BER = 0") {
    val key = WmKey(seed = "20")
    val wm  = "1011001"
    val e   = GraftCache.memo(s"test-edges") { KnnGraph.edges(emb, M) }
    val ai  = KnnGraph.accessibility(emb, e)
    val wmDf = Tvp.embedAi(emb, wm, 0.6, 0.5, ai, 64, key)
    val got  = Tvp.extract(wmDf, wm.length, 64, key)
      .orderBy("bit_pos").collect().map(_.getInt(1)).mkString
    assert(got == wm)
  }

  test("BER degrades monotonically-ish under growing adaptive deletion") {
    val key = WmKey(seed = "20")
    val wm  = "10110"
    val e   = GraftCache.memo(s"test-edges") { KnnGraph.edges(emb, M) }
    val ai  = KnnGraph.accessibility(emb, e).cache()
    val wmDf = Tvp.embedAi(emb, wm, 0.7, 1.0, ai, 64, key).cache()
    val bits = Tvp.bitsDf(spark, wm)
    val bers = Seq(0.0, 0.4, 0.9).map { p =>
      val attacked = if (p == 0.0) wmDf else Attacks.adaptiveDelete(wmDf, ai, p)
      Tvp.ber(bits, Tvp.extract(attacked, wm.length, 64, key))
    }
    assert(bers.head == 0.0, s"BER at p=0 must be 0, got $bers")
    assert(bers.last >= bers.head)
  }

  test("attack impact: hitRate < 1 after deletion, miss/false accounting") {
    val raw   = GraftCache.memo("test-raw") { KnnGraph.rawKnn(emb, 2 * M + 1) }
    val base  = raw.filter(col("rank") <= 10).cache()
    val att   = Attacks.randomDelete(emb, 0.3, "42").cache()
    val after = Knn.exact(emb, att, 10).cache()
    val hr    = Metrics.hitRate(base, after, 10)
    assert(hr > 0.5 && hr < 1.0, s"hitRate $hr")
    val carriers = emb.filter(col("vec_id") < 25).select("vec_id")
    val mf = Metrics.missFalse(
      Metrics.carrierHits(base, carriers), Metrics.carrierHits(after, carriers))
    assert(mf.count() > 0)
    assert(mf.filter(col("miss") < 0 || col("false_hits") < 0).count() == 0)
  }
}
