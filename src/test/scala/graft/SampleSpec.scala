package graft

import graft.functions.Hashing
import graft.text.Sample
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Priority sampling's contracts: the sampled set is exactly the k largest
  * w/u priorities (cross-checked against an independent driver-side
  * computation of the same keyed draws), membership is partition-invariant,
  * and the Duffield–Lund–Thorup estimator Σ max(w_i, τ) over the sample
  * recovers the population's total weight.
  */
class SampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val n = 2000
  private val k = 200
  private def pop = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, 1.0 + (i % 10))).toDF("id", "w")
  }

  test("the sample IS the k largest priorities (column vs driver draw agree bit-for-bit)") {
    val got = Sample.priorityTopK(pop, "id", col("w"), k, "spec")
      .select("rank", "id", "__pri")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // independent reference: the same (0,1] draws, driver-side — the 52-bit
    // md5 prefix +1 over 2^52 (Sample.unitCol's shifted form of
    // Hashing.unitUniform; DLT requires u > 0)
    val ref = (0 until n).map { i =>
      val w = 1.0 + (i % 10)
      val bits = new java.math.BigInteger(
        Hashing.md5Hex(s"spec|$i").substring(0, 13), 16).longValue()
      (i.toLong, w / ((bits + 1).toDouble / 4503599627370496.0))
    }.sortBy { case (id, pri) => (-pri, id) }.take(k)
    assert(got.length == k)
    got.zip(ref).zipWithIndex.foreach { case (((rank, id, pri), (rid, rpri)), idx) =>
      assert(rank == idx + 1, s"rank drift at $idx")
      assert(id == rid, s"membership drift at rank ${idx + 1}: $id vs $rid")
      assert(java.lang.Double.doubleToLongBits(pri) ==
        java.lang.Double.doubleToLongBits(rpri),
        s"column and driver priorities differ at rank ${idx + 1}")
    }
  }

  test("membership is partition-invariant") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sample.priorityTopK(df, "id", col("w"), k, "spec")
        .select("id").collect().map(_.getLong(0)).toSeq
    val ref = ids(pop)
    assert(ids(pop.repartition(13)) == ref && ids(pop.coalesce(1)) == ref,
      "repartitioning changed the sampled set — the draw leaked partition order")
  }

  test("the subset-sum estimator Σ max(w, τ) recovers the total weight") {
    val trueTotal = (0 until n).map(i => 1.0 + (i % 10)).sum
    val t = Sample.tau(pop, "id", col("w"), k, "spec")
    assert(t > 0.0, "k < n must yield a positive threshold")
    val est = Sample.priorityTopK(pop, "id", col("w"), k, "spec")
      .select(greatest(col("__w"), lit(t)).as("e"))
      .agg(sum("e")).head().getDouble(0)
    // DLT: unbiased with near-optimal variance; at k=200 of n=2000 a 15%
    // band is ~4 sigma for this weight mix — a failure here means the
    // estimator (not the luck) broke
    assert(math.abs(est - trueTotal) / trueTotal < 0.15,
      s"estimate $est vs true $trueTotal drifted beyond the 15% band")
    // weight-0 rows are never sampled (documented: priority 0)
    import spark.implicits._
    val withZero = pop.withColumn("w", when(col("id") < 1000, 0.0).otherwise(col("w")))
    val z = Sample.priorityTopK(withZero, "id", col("w"), k, "spec")
      .filter(col("id") < 1000).count()
    assert(z == 0, "a zero-weight row was sampled")
  }

  test("sqrt-temperature mixture: quotas apportion to exactly k and flatten the mix") {
    // the registered query's apportionment arithmetic, driver-side: verify
    // Σ quota == k for adversarial count mixes (incl. remainder ties) and
    // that α = 0.5 actually FLATTENS — a source 100× larger gets only 10×
    // the quota
    def quotas(counts: Seq[(String, Long)], k: Double): Map[String, Long] = {
      val rows = counts.sortBy(_._1).map { case (s, n) => (s, n, math.sqrt(n.toDouble)) }
      val bigW = rows.foldLeft(0.0)((a, r) => a + r._3)
      val base = rows.map { case (s, _, w) =>
        (s, math.floor(k * w / bigW).toLong, k * w / bigW - math.floor(k * w / bigW))
      }
      val rem = (k - base.map(_._2).sum).toInt
      val extras = base.sortBy { case (s, _, f) => (-f, s) }.take(rem).map(_._1).toSet
      base.map { case (s, b, _) => s -> (b + (if (extras.contains(s)) 1L else 0L)) }.toMap
    }
    val q1 = quotas(Seq("a" -> 10000L, "b" -> 100L), 120)
    assert(q1.values.sum == 120)
    assert(q1("a").toDouble / q1("b") <= 11.0,
      s"alpha=0.5 must flatten a 100x count gap to ~10x: $q1")
    // remainder ties: equal counts split the remainder deterministically
    val q2 = quotas(Seq("a" -> 7L, "b" -> 7L, "c" -> 7L), 100)
    assert(q2.values.sum == 100, s"apportionment drifted under ties: $q2")
    // degenerate: one source takes everything
    assert(quotas(Seq("only" -> 5L), 120) == Map("only" -> 120L))
  }

  test("the plan is TakeOrderedAndProject — no global sort") {
    val df = Sample.priorityTopK(pop.repartition(8), "id", col("w"), k, "spec")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k must be per-partition + driver merge, not a global sort:\n$p")
  }
}
