package graft

import graft.graph.KnnGraph
import org.scalatest.funsuite.AnyFunSuite

/** Parity gates for the alternating large-star/small-star components: the
  * labels must equal a union-find ground truth on the shapes that break
  * naive formulations — paths (high diameter), cycles (every node degree 2),
  * stars (one hub), forests of mixed shapes, and seeded random graphs —
  * regardless of input edge direction.
  */
class CcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
        parent(hi) = lo }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)], tag: String): Unit = {
    import spark.implicits._
    val got = KnnGraph.componentsUndirected(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = brute(edges)
    assert(got == want, s"$tag: stars labels diverged from union-find\n" +
      s"got  ${got.toSeq.sorted.take(20)}\nwant ${want.toSeq.sorted.take(20)}")
  }

  test("path graph (the high-diameter shape the algorithm exists for)") {
    check((0L until 60L).map(i => (i, i + 1)), "path-61")
    // reversed edge direction must not matter
    check((0L until 60L).map(i => (i + 1, i)), "path-61-reversed")
  }

  test("cycle, star, and two disjoint components") {
    check((0L until 40L).map(i => (i, (i + 1) % 40)), "cycle-40")
    check((1L to 30L).map(i => (i, 0L)), "star-31")
    check((0L until 20L).map(i => (i, i + 1)) ++
      (100L until 120L).map(i => (i, i + 1)), "two-paths")
  }

  test("seeded random graphs, both sparse and denser") {
    val rnd = new scala.util.Random(42)
    for (nEdges <- Seq(120, 400)) {
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter { case (a, b) => a != b }
      check(edges, s"random-$nEdges")
    }
  }
}
