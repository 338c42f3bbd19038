package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the skew-salted join: row-set parity with the plain join (the
  * property the oracle relies on), the partition-balance win on a hot key
  * (the reason the operator exists), and the bounded-census guard.
  */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** 20k rows, 90% on key "hot", remainder uniform over 10 cold keys. */
  private def skewedFact = {
    import spark.implicits._
    (0 until 20000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"cold${i % 7}"
      (i.toLong, k, i.toDouble / 3.0)
    }.toDF("row_id", "k", "v")
  }

  private def dim = {
    import spark.implicits._
    (Seq("hot") ++ (0 until 7).map(i => s"cold$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 100L) }.toDF("k", "attr")
  }

  test("salted join is row-identical to the plain join") {
    val salted = SkewJoin.innerSalted(skewedFact, dim, "k", col("row_id"),
      nSalt = 8, heavyThreshold = 1000)
    val plain = skewedFact.join(dim, "k")
    assert(salted.count() == 20000L)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting spreads the hot key: max join-partition share drops ~nSalt-fold") {
    def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("__p", spark_partition_id())
        .groupBy("__p").agg(count(lit(1)).as("n"))
        .agg(max("n")).collect()(0).getLong(0)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE's own skew splitting would mask what the salt contributes; the
    // operator must balance on its own for the cases AQE cannot touch
    // (bucketed sides, shuffle-hash joins, downstream keyed aggs)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val unsalted = maxPartRows(
        skewedFact.join(dim.hint("shuffle_merge"), "k"))
      val salted = maxPartRows(SkewJoin.innerSalted(
        skewedFact, dim, "k", col("row_id"), nSalt = 8, heavyThreshold = 1000))
      // hot = 18k rows: unsalted lands them in ONE task; salted spreads
      // them over 8 sub-keys (~2250 each). Sub-keys then hash into the 32
      // shuffle partitions with birthday collisions (here 3 of 8 share a
      // partition → max ≈ 3·2250), so the guaranteed win is a 2×+ drop,
      // not a clean nSalt-fold — deterministic for this fixed data.
      assert(unsalted >= 18000L, s"skew fixture lost its hot partition: $unsalted")
      assert(salted * 2 < unsalted,
        s"salting did not spread the hot key: max $salted vs unsalted $unsalted")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("no heavy keys → plain join; census guard trips on near-uniform keys") {
    val noHeavy = SkewJoin.innerSalted(skewedFact, dim, "k", col("row_id"),
      nSalt = 8, heavyThreshold = 100000)
    assert(noHeavy.count() == 20000L)
    assert(!noHeavy.columns.contains("__salt"))
    // every cold key qualifies at threshold 1 — more candidates than
    // maxHeavy means the threshold is mis-sized, not that all keys salt
    val e = intercept[IllegalArgumentException] {
      SkewJoin.heavyKeys(skewedFact, "k", heavyThreshold = 1, maxHeavy = 3)
    }
    assert(e.getMessage.contains("raise the"))
  }

  test("sampled census finds exactly the exact census's heavy keys at 1/100 the shuffle") {
    import spark.implicits._
    // high-cardinality corpus: 500k rows, 30% on "whale", 10% on "shark",
    // the rest on ~300k UNIQUE keys — the regime where the full census
    // shuffles |distinct| ≈ |rows| and sampling is the point
    val n = 500000
    val fact = spark.range(n).select(col("id").as("row_id"),
      when(col("id") % 10 < 3, lit("whale"))
        .when(col("id") % 10 < 4, lit("shark"))
        .otherwise(concat(lit("u"), col("id"))).as("k"))
    val exact = SkewJoin.heavyKeys(fact, "k",
      heavyThreshold = (0.05 * n).toLong).map(_.toString).toSet
    val sampled = SkewJoin.heavyKeysSampled(fact, "k", col("row_id"),
      minShare = 0.05, sampleRate = 0.01).map(_.toString).toSet
    assert(exact == Set("whale", "shark"), s"exact census broke: $exact")
    assert(sampled.contains("whale") && sampled.contains("shark"),
      s"sampled census missed a true heavy key: $sampled")
    // safety=0.5 admits keys down to ~2.5% sample share — no unique key
    // (share 1/500k) can come close, so no false positives either
    assert(sampled == exact, s"sampled census over-admitted: $sampled")
  }

  test("sampled census: pigeonhole candidate bound and empty-sample behavior") {
    import spark.implicits._
    val tiny = Seq((1L, "a"), (2L, "b")).toDF("row_id", "k")
    // a sample rate low enough to keep nothing → no heavy keys, no throw
    assert(SkewJoin.heavyKeysSampled(tiny, "k", col("row_id"),
      minShare = 0.5, sampleRate = 1e-12).isEmpty)
    // near-uniform keys at a threshold everything passes → the guard trips
    val uni = spark.range(1000).select(col("id").as("row_id"),
      concat(lit("k"), col("id") % 40).as("k"))
    val e = intercept[IllegalArgumentException] {
      SkewJoin.heavyKeysSampled(uni, "k", col("row_id"),
        minShare = 0.001, sampleRate = 1.0, maxHeavy = 8)
    }
    assert(e.getMessage.contains("raise minShare"))
  }
}
