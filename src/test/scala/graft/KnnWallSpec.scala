package graft

import graft.knn.Knn
import org.scalatest.funsuite.AnyFunSuite

/** The exact-kNN broadcast regime's TOTAL memory wall
  * (`graft.knn.broadcastMaxBytes`): a corpus whose flat index would
  * outgrow the budget must fail LOUDLY — before any large allocation —
  * naming the scale families (IVF / LSH / graph), instead of streaming
  * toward a driver OOM. The per-group wall (exactGrouped's maxIndexRows)
  * bounds one index's scan cost; this wall bounds the RESIDENT SET.
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

  test("exactGrouped walls on the SUM of group indexes, not any one group") {
    val df = vecs(100) // two groups of 50: each ~2400 B, sum ~4800 B
    val e = withBudget(3000L) { // admits either group alone, not both
      intercept[IllegalStateException] {
        Knn.exactGrouped(df, df, 3, "grp").count()
      }
    }
    assert(e.getMessage.contains("Knn.exactGrouped") &&
      e.getMessage.contains("broadcastMaxBytes"), e.getMessage)
    // the split branch (per-group skew sub-indexes) hits the same wall
    val e2 = withBudget(3000L) {
      intercept[IllegalStateException] {
        Knn.exactGrouped(df, df, 3, "grp", maxIndexRows = 10).count()
      }
    }
    assert(e2.getMessage.contains("broadcastMaxBytes"), e2.getMessage)
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
