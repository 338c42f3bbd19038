package graft

import graft.knn.Knn
import org.scalatest.funsuite.AnyFunSuite

/** The exact-kNN broadcast regime's TOTAL memory budget
  * (`graft.knn.broadcastMaxBytes`). Ungrouped `exact` past the budget must
  * fail LOUDLY — before any large allocation — naming the scale families
  * (IVF / LSH / graph), instead of streaming toward a driver OOM; GROUPED
  * search instead DISPATCHES to the executor-side cogrouped kernel, whose
  * results must be bit-identical. The per-group wall (maxIndexRows) bounds
  * one index's scan cost; the byte budget bounds the RESIDENT SET.
  */
class KnnWallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def vecs(n: Int, d: Int = 8) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, Array.fill(d)(i.toFloat), (i % 2).toDouble))
      .toDF("vec_id", "embedding", "grp")
  }

  private def withBudget[A](bytes: Long)(body: => A): A = {
    spark.conf.set("graft.knn.broadcastMaxBytes", bytes.toString)
    try body finally spark.conf.unset("graft.knn.broadcastMaxBytes")
  }

  test("exact fails loudly past the byte budget, naming the scale families") {
    val df = vecs(100) // 100 rows × (8×4 + 8 + 8) = 4800 bytes with norms
    val e = withBudget(1000L) {
      intercept[IllegalStateException] { Knn.exact(df, df, 3).count() }
    }
    assert(e.getMessage.contains("broadcastMaxBytes"), e.getMessage)
    assert(e.getMessage.contains("ivfDetSearch") && e.getMessage.contains("GraphAnn"),
      s"the wall must name the scale alternatives: ${e.getMessage}")
  }

  test("exactGrouped dispatches past the SUM budget to the cogrouped kernel, bit-identically") {
    val df = vecs(100) // two groups of 50: each ~2400 B, sum ~4800 B
    val base = Knn.exactGrouped(df, df, 3, "grp", kernel = "fold")
      .collect().map(_.toSeq).toSet
    // a budget that admits either group alone but not both: the dispatch
    // must route to the executor-side cogrouped build and return the SAME
    // rows (same kernel, same tie-breaks)
    val dispatched = withBudget(3000L) {
      Knn.exactGrouped(df, df, 3, "grp", kernel = "fold")
        .collect().map(_.toSeq).toSet
    }
    assert(dispatched == base,
      "the beyond-budget cogrouped dispatch must be bit-identical")
    // the split branch (per-group skew sub-indexes) crosses the same
    // dispatch with the same result
    val baseSplit = Knn.exactGrouped(df, df, 3, "grp", kernel = "fold",
      maxIndexRows = 10).collect().map(_.toSeq).toSet
    assert(baseSplit == base, "the split broadcast branch must already be bit-identical")
    val dispatchedSplit = withBudget(3000L) {
      Knn.exactGrouped(df, df, 3, "grp", kernel = "fold", maxIndexRows = 10)
        .collect().map(_.toSeq).toSet
    }
    assert(dispatchedSplit == base,
      "the beyond-budget SPLIT cogrouped dispatch must be bit-identical")
  }

  test("exactGroupedCogrouped equals the broadcast kernel on every metric/kernel") {
    val df = vecs(60)
    for ((metric, kernel) <- Seq(("l2", "fast"), ("l2", "fold"), ("cosine", "fold"))) {
      val a = Knn.exactGrouped(df, df, 4, "grp", metric = metric, kernel = kernel)
        .collect().map(_.toSeq).toSet
      val b = Knn.exactGroupedCogrouped(df, df, 4, "grp", metric = metric, kernel = kernel)
        .collect().map(_.toSeq).toSet
      assert(a == b, s"cogrouped drifted from broadcast at ($metric, $kernel)")
    }
  }

  test("within the budget, results are unchanged") {
    val df = vecs(40, d = 4)
    val base  = Knn.exact(df, df, 3, kernel = "fold").collect().toSet
    val walled = withBudget(1L << 20) {
      Knn.exact(df, df, 3, kernel = "fold").collect().toSet
    }
    assert(walled == base, "a generous wall must not change any result")
  }
}
