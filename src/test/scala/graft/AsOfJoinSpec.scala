package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the as-of join: pairwise parity with the brute-force theta-join
  * argmax (the definition), the inclusive-tie and no-match edges, and the
  * single-exchange plan shape (the reason the union+window form exists).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // fact: 3 keys × irregular times; key "c" has no dim rows at all
  private def fact = {
    import spark.implicits._
    Seq(("a", 5L, 1L), ("a", 10L, 2L), ("a", 17L, 3L), ("a", 3L, 4L),
        ("b", 10L, 5L), ("b", 100L, 6L), ("c", 50L, 7L))
      .toDF("k", "t", "fid")
  }

  private def dim = {
    import spark.implicits._
    // "a": updates at 4, 10, 15 — fact t=10 must take the t=10 row
    // (inclusive), t=17 the t=15 row, t=3 nothing.
    Seq(("a", 4L, 40L), ("a", 10L, 100L), ("a", 15L, 150L), ("b", 99L, 990L))
      .toDF("k", "t", "v")
  }

  test("matches the brute-force latest-at-or-before definition") {
    val got = AsOfJoin.backward(fact, dim, "k", "t", Seq("v"))
      .select("fid", "v").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expected = Map(
      1L -> Some(40L),   // a@5  ← dim a@4
      2L -> Some(100L),  // a@10 ← dim a@10 (inclusive tie)
      3L -> Some(150L),  // a@17 ← dim a@15
      4L -> None,        // a@3 predates every dim row
      5L -> None,        // b@10 predates b@99
      6L -> Some(990L),  // b@100 ← dim b@99
      7L -> None)        // key c has no dim rows
    assert(got == expected)
    assert(AsOfJoin.backward(fact, dim, "k", "t", Seq("v")).count() == 7L,
      "left semantics: every fact row survives")
  }

  test("agrees with the theta-join argmax on a keyed-random corpus") {
    import spark.implicits._
    // md5-keyed pseudo-random times so the case is deterministic
    val f = spark.range(2000).select(
      (col("id") % 37).cast("string").as("k"),
      (conv(substring(md5(concat(lit("f"), col("id"))), 1, 12), 16, 10)
        .cast("long") % 100000L).as("t"),
      col("id").as("fid"))
    val d = spark.range(300).select(
      (col("id") % 37).cast("string").as("k"),
      (conv(substring(md5(concat(lit("d"), col("id"))), 1, 12), 16, 10)
        .cast("long") % 100000L).as("t"),
      (col("id") * 10L).as("v"))
      .groupBy("k", "t").agg(max("v").as("v"))
    val fast = AsOfJoin.backward(f, d, "k", "t", Seq("v"))
      .select("fid", "v")
    val brute = f.as("f").join(d.as("d"),
        col("f.k") === col("d.k") && col("d.t") <= col("f.t"), "left")
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("fid").orderBy(col("d.t").desc_nulls_last)))
      .filter(col("__rk") === 1).select(col("fid"), col("v"))
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
  }

  test("forward matches the earliest-at-or-after definition") {
    val got = AsOfJoin.forward(fact, dim, "k", "t", Seq("v"))
      .select("fid", "v").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expected = Map(
      1L -> Some(100L),  // a@5  → dim a@10
      2L -> Some(100L),  // a@10 → dim a@10 (inclusive tie)
      3L -> None,        // a@17 has no later dim row
      4L -> Some(40L),   // a@3  → dim a@4
      5L -> Some(990L),  // b@10 → dim b@99
      6L -> None,        // b@100 past every dim row
      7L -> None)        // key c has no dim rows
    assert(got == expected)
  }

  test("forward agrees with the theta-join argmin on a keyed-random corpus") {
    import spark.implicits._
    val f = spark.range(1500).select(
      (col("id") % 23).cast("string").as("k"),
      (conv(substring(md5(concat(lit("ff"), col("id"))), 1, 12), 16, 10)
        .cast("long") % 50000L).as("t"),
      col("id").as("fid"))
    val d = spark.range(200).select(
      (col("id") % 23).cast("string").as("k"),
      (conv(substring(md5(concat(lit("fd"), col("id"))), 1, 12), 16, 10)
        .cast("long") % 50000L).as("t"),
      (col("id") * 3L).as("v"))
      .groupBy("k", "t").agg(max("v").as("v"))
    val fast = AsOfJoin.forward(f, d, "k", "t", Seq("v")).select("fid", "v")
    val brute = f.as("f").join(d.as("d"),
        col("f.k") === col("d.k") && col("d.t") >= col("f.t"), "left")
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("fid").orderBy(col("d.t").asc_nulls_last)))
      .filter(col("__rk") === 1).select(col("fid"), col("v"))
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
  }

  test("bucketed backward is row-identical to backward at every width") {
    import spark.implicits._
    val f = spark.range(3000).select(
      (col("id") % 11).cast("string").as("k"),
      (conv(substring(md5(concat(lit("bf"), col("id"))), 1, 12), 16, 10)
        .cast("long") % 100000L).as("t"),
      col("id").as("fid"))
    val d = spark.range(400).select(
      (col("id") % 11).cast("string").as("k"),
      (conv(substring(md5(concat(lit("bd"), col("id"))), 1, 12), 16, 10)
        .cast("long") % 100000L).as("t"),
      (col("id") * 5L).as("v"))
      .groupBy("k", "t").agg(max("v").as("v"))
    val plain = AsOfJoin.backward(f, d, "k", "t", Seq("v")).select("fid", "v")
    // widths spanning: many tiny buckets, a realistic slice, one giant
    // bucket (degenerates to the plain form), and a non-divisor width
    for (w <- Seq(10L, 1000L, 7777L, 1000000L)) {
      val b = AsOfJoin.backwardBucketed(f, d, "k", "t", Seq("v"), w)
        .select("fid", "v")
      assert(b.exceptAll(plain).isEmpty && plain.exceptAll(b).isEmpty,
        s"width $w diverged from the plain backward join")
    }
    // the hand-built edge fixture too (no-dim keys, ties, pre-dim facts)
    val pb = AsOfJoin.backward(fact, dim, "k", "t", Seq("v")).select("fid", "v")
    val bb = AsOfJoin.backwardBucketed(fact, dim, "k", "t", Seq("v"), 6L)
      .select("fid", "v")
    assert(bb.exceptAll(pb).isEmpty && pb.exceptAll(bb).isEmpty)
  }

  test("bucketed backward's big window partitions by (key, bucket)") {
    val p = AsOfJoin.backwardBucketed(fact, dim, "k", "t", Seq("v"), 6L)
      .queryExecution.executedPlan.toString
    assert(p.contains("__bkt"), "the time-slice bucket vanished from the plan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("plan is join-free: one hash exchange on the key, no nested loop") {
    val p = AsOfJoin.backward(fact, dim, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of planned a join node:\n$p")
    assert(p.contains("Window"), "the running-last window vanished")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"expected exactly one hash exchange (on the key), saw $exchanges")
  }
}
