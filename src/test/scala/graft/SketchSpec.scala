package graft

import graft.functions.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the KMV distinct sketch: losslessness below k, estimator
  * accuracy above k (KMV stderr ≈ 1/√(k−2) ≈ 12.7% at k=64 — the 2σ bound
  * here is deterministic, not flaky: same data, same hashes, same estimate),
  * partition-count invariance (the merge is order-free), and the two-level
  * selection plan.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("below k the sketch is the exact distinct count") {
    import spark.implicits._
    val df = (0 until 500).map(i => ("g", i % 40L)).toDF("g", "v")
    val r = Sketches.kmvDistinct(df, Seq("g"), col("v"), k = 64).collect()(0)
    assert(r.getLong(1) == 40L && r.getLong(2) == 40L,
      s"40 distinct < k=64 must report exactly 40: $r")
  }

  test("above k the estimate lands within 2 sigma of the truth") {
    import spark.implicits._
    val n = 10000L
    val df = spark.range(3 * n).select(
      (col("id") % 3).cast("string").as("g"),
      (col("id") / 3).cast("long").as("v")) // each group: n distinct values
    val got = Sketches.kmvDistinct(df, Seq("g"), col("v"), k = 64)
      .orderBy("g").collect()
    got.foreach { r =>
      val est = r.getLong(2)
      assert(r.getLong(1) == 64L, s"group kept ${r.getLong(1)} != k")
      assert(math.abs(est - n) < 0.26 * n,
        s"group ${r.getString(0)}: est $est vs true $n — beyond 2 sigma")
    }
  }

  test("the estimate is invariant to input partitioning") {
    import spark.implicits._
    val df = spark.range(5000).select(lit("g").as("g"), col("id").as("v"))
    val a = Sketches.kmvDistinct(df.repartition(3), Seq("g"), col("v")).collect()(0)
    val b = Sketches.kmvDistinct(df.repartition(17), Seq("g"), col("v")).collect()(0)
    assert(a == b, s"$a != $b — the bottom-k merge must be order-free")
  }

  test("BottomKAgg: insert/merge keep the k smallest distinct, any order") {
    val a = new graft.functions.BottomKAgg(4)
    val buf = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 9L, 5L).foldLeft(a.zero)(a.reduce)
    assert(buf.toSeq == Seq(1L, 2L, 3L, 5L), s"got ${buf.toSeq}")
    // merge: overlapping halves, duplicates across sides, truncation to k
    val left = Seq(10L, 4L, 6L).foldLeft(a.zero)(a.reduce)
    val right = Seq(4L, 1L, 11L, 6L).foldLeft(a.zero)(a.reduce)
    assert(a.merge(left, right).toSeq == Seq(1L, 4L, 6L, 10L))
    assert(a.merge(right, left).toSeq == Seq(1L, 4L, 6L, 10L),
      "merge must be commutative")
    assert(a.merge(a.zero, left).toSeq == left.toSeq)
  }

  test("Aggregator path lands on the window path's exact estimates") {
    val dir = TestSpark.sf0001
    val win = SparkEntry.queries("profile_distinct_kmv")(spark, dir).collect()
    val agg = SparkEntry.queries("profile_distinct_kmv_agg")(spark, dir).collect()
    assert(win.nonEmpty && win.length == agg.length)
    win.zip(agg).foreach { case (w, g) => assert(w == g, s"$w != $g") }
  }

  test("CMS never underestimates, and is exact when the table is collision-free") {
    import spark.implicits._
    val counts = (0 until 500).map(i => (s"k$i", (i % 17 + 1).toLong))
      .toDF("key", "n")
    // wide sketch: 500 keys over 4×8192 buckets — per-row collision odds
    // ~1.5%, min over 4 independent rows ~5e-8; exactness is deterministic
    // for this fixed key set (and would fail loudly if the hash changed)
    val wide = Sketches.cmsProbe(
      Sketches.cmsBuild(counts, "key", "n", d = 4, w = 8192),
      counts, "key", d = 4, w = 8192)
    assert(wide.join(counts, "key").filter(col("n_cms") =!= col("n")).isEmpty,
      "collision-free sketch must be exact")
    // narrow sketch: collisions guaranteed (500 keys, 4×64 cells) — the
    // estimate must only ever move UP
    val narrow = Sketches.cmsProbe(
      Sketches.cmsBuild(counts, "key", "n", d = 4, w = 64),
      counts, "key", d = 4, w = 64)
    assert(narrow.join(counts, "key").filter(col("n_cms") < col("n")).isEmpty,
      "CMS underestimated — min-of-sums can only overcount")
    assert(narrow.join(counts, "key").filter(col("n_cms") > col("n")).count() > 0,
      "a 4x64 sketch of 500 keys with no collisions means the hash is broken")
  }

  test("CMS cells are invariant to input partitioning") {
    import spark.implicits._
    val counts = (0 until 300).map(i => (s"k$i", i.toLong + 1)).toDF("key", "n")
    val a = Sketches.cmsBuild(counts.repartition(3), "key", "n")
      .orderBy("__j", "__b").collect().toSeq
    val b = Sketches.cmsBuild(counts.repartition(11), "key", "n")
      .orderBy("__j", "__b").collect().toSeq
    assert(a == b, "cell sums must be partition-order-free")
  }

  test("the bottom-k selection pre-prunes map-side (WindowGroupLimit Partial)") {
    import spark.implicits._
    // a non-constant group key, so the window actually partitions
    val df = spark.range(5000).select(
      (col("id") % 3).cast("string").as("g"), col("id").as("v"))
    val p = Sketches.kmvDistinct(df, Seq("g"), col("v"))
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"no map-side top-k prune — a billion-distinct group would ship its " +
        s"whole distinct set into one sort task:\n$p")
  }

  // ---- bloomBuild / bloomMightContain ----

  test("bloom: NO false negatives ever; false positives bounded near theory") {
    import spark.implicits._
    val members = (0 until 300).map(i => s"m$i").toDF("k")
    val outsiders = (0 until 3000).map(i => s"x$i").toDF("k")
    val bloom = Sketches.bloomBuild(members, "k", mBits = 4096, d = 3)
    val vm = Sketches.bloomMightContain(bloom, members, "k", 4096, 3)
    assert(vm.filter(col("might_contain") =!= 1L).isEmpty,
      "a member missed — a Bloom false negative is a correctness bug, not noise")
    val fp = Sketches.bloomMightContain(bloom, outsiders, "k", 4096, 3)
      .filter(col("might_contain") === 1L).count()
    // theory: (1 − e^(−d·n/m))^d ≈ 0.0077 at n=300, m=4096, d=3 → ~23 of
    // 3000; deterministic hashes make the bound a fixed assertion
    assert(fp < 120, s"$fp false positives of 3000 — far beyond the FP model")
  }

  test("bloom words are invariant to input partitioning and never touch the sign bit") {
    import spark.implicits._
    val keys = spark.range(2000).select(concat(lit("k"), col("id")).as("k"))
    val a = Sketches.bloomBuild(keys.repartition(3), "k").orderBy("__word")
      .collect().toSeq
    val b = Sketches.bloomBuild(keys.repartition(17), "k").orderBy("__word")
      .collect().toSeq
    assert(a == b, "bit_or merge must be partition-order-free")
    assert(a.forall(_.getLong(1) >= 0L),
      "a sign bit got set — the 63-bit word contract (DuckDB errors on 1<<63) broke")
  }

  test("bloom pre-filter + exact join is row-identical to the plain join") {
    import spark.implicits._
    val dim = (0 until 50).map(i => (s"u${i * 7}", i.toLong)).toDF("k", "attr")
    val fact = (0 until 5000).map(i => (s"u$i", i.toLong)).toDF("k", "v")
    val plain = fact.join(dim, "k").select("k", "v", "attr").collect().toSet
    val candidates = Sketches.bloomMightContain(
        Sketches.bloomBuild(dim.select("k"), "k"), fact.select("k"), "k")
      .filter(col("might_contain") === 1L).select("k")
    val reduced = fact.join(candidates, "k") // superset: FPs still present
      .join(dim, "k").select("k", "v", "attr").collect().toSet
    assert(reduced == plain,
      "semi-join reduction changed the row set — the exact join must erase FPs")
  }

  // ---- quantileSketch ----

  test("quantile sketch is EXACT when the group holds at most k rows") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i.toLong, i / 100.0)).toDF("g", "rid", "v")
    val got = Sketches.quantileSketch(df, Seq("g"), col("v"), col("rid"),
        k = 256, qsPerMille = Seq(100, 500, 900, 990))
      .orderBy("q_pm").collect()
    // n = 100 ≤ k: est(q) = ceil(q·100)-th smallest = q·100/100.0 exactly
    val want = Seq(100 -> 100000L, 500 -> 500000L, 900 -> 900000L, 990 -> 990000L)
    assert(got.map(r => (r.getInt(1), r.getLong(3))).toSeq == want,
      s"sub-k group must answer exactly: ${got.mkString(",")}")
    assert(got.forall(_.getLong(2) == 100L), "n_sample must be the group size")
  }

  test("quantile sketch honors the DKW bound on a 20k-row continuous column") {
    import spark.implicits._
    // strictly increasing continuous values: true rank of value v is v·n
    val n = 20000
    val df = spark.range(n).select(lit("g").as("g"), col("id").as("rid"),
      (col("id").cast("double") / n).as("v"))
    val got = Sketches.quantileSketch(df, Seq("g"), col("v"), col("rid"), k = 256)
      .collect().map(r => (r.getInt(1), r.getLong(3)))
    // deterministic hashes → a fixed assertion, not a flaky one. DKW at
    // k=256: ε = 0.1 with prob ≥ 98%; assert within 0.12 for slack.
    got.foreach { case (qpm, estMicros) =>
      val trueQ = qpm / 1000.0
      val estQ = estMicros / 1.0e6 // value == its own quantile by construction
      assert(math.abs(estQ - trueQ) < 0.12,
        s"q=$qpm: estimate $estQ beyond the DKW ε for k=256")
    }
    assert(got.length == 4)
  }

  test("quantile sketch is invariant to input partitioning") {
    import spark.implicits._
    val df = spark.range(5000).select(lit("g").as("g"), col("id").as("rid"),
      (col("id").cast("double") * 0.37).as("v"))
    val a = Sketches.quantileSketch(df.repartition(3), Seq("g"), col("v"), col("rid"))
      .orderBy("q_pm").collect().toSeq
    val b = Sketches.quantileSketch(df.repartition(17), Seq("g"), col("v"), col("rid"))
      .orderBy("q_pm").collect().toSeq
    assert(a == b, s"$a != $b — the bottom-k row sample must be order-free")
  }

  test("quantile sketch selection pre-prunes map-side like the KMV path") {
    import spark.implicits._
    val df = spark.range(5000).select(
      (col("id") % 3).cast("string").as("g"), col("id").as("rid"),
      col("id").cast("double").as("v"))
    val p = Sketches.quantileSketch(df, Seq("g"), col("v"), col("rid"))
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"no map-side sample prune — a huge group would ship every row into " +
        s"one sort task:\n$p")
  }
}
