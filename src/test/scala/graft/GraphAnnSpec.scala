package graft

import graft.ann.GraphAnn
import graft.graph.KnnGraph
import graft.knn.Knn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant gates for the graph-traversal ANN family (GraphAnn): recall is
  * monotone in the round count (the scored set only grows, and the beam
  * keeps the best-so-far, so a true top-k member can only be displaced by
  * another true top-k member), the traversal is deterministic, and the
  * result shape is a proper per-query ranking. The oracle gates exactness
  * (ann_graph_topk / ann_graph_recall); this spec gates the search
  * contract on shapes the oracle doesn't sweep.
  */
class GraphAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private lazy val emb = Tables.embeddings(spark, TestSpark.sf0001).cache()
  private lazy val edges = KnnGraph.edges(emb, 8).cache()
  private lazy val entries = GraphAnn.entryPoints(emb, 4)
  private lazy val queries = emb.filter(col("vec_id") < 20)

  private def recallAt(rounds: Int): Double = {
    val exact = Knn.exact(queries, emb, 10, kernel = "fold")
      .select("query_id", "neighbor_id")
    val g = GraphAnn.beamSearch(queries, emb, edges, entries,
        k = 10, beam = 16, rounds = rounds)
      .select("query_id", "neighbor_id")
    exact.join(g, Seq("query_id", "neighbor_id"), "left_semi").count().toDouble /
      exact.count().toDouble
  }

  test("recall@10 is monotone in rounds and high once the beam floods the fixture") {
    val r0 = recallAt(0); val r2 = recallAt(2); val r4 = recallAt(4)
    assert(r0 <= r2 + 1e-12 && r2 <= r4 + 1e-12,
      s"recall must be monotone in rounds: $r0, $r2, $r4")
    assert(r4 > 0.8, s"4-round beam should recover most exact neighbors, got $r4")
    assert(r0 < 1.0, "round 0 (entries only) finding everything means the test is vacuous")
  }

  test("traversal is deterministic and emits a proper per-query ranking") {
    def run() = GraphAnn.beamSearch(queries, emb, edges, entries, 10, 16, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val a = run(); val b = run()
    assert(a == b, "two identical traversals must produce identical rows")
    a.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._4) == (1 to rows.length), s"ranks of query $q not consecutive")
      assert(rows.map(_._3) == rows.map(_._3).sorted, s"dists of query $q not ascending")
    }
  }

  test("beam must cover k") {
    intercept[IllegalArgumentException] {
      GraphAnn.beamSearch(queries, emb, edges, entries, k = 10, beam = 5, rounds = 1)
    }
  }
}
