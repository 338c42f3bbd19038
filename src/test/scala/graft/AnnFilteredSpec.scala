package graft

import graft.ann.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hybrid (predicate + vector) search: regime dispatch, contract honesty
  * (post-filter may under-fill, never over-reaches), and the exactness
  * limits of each path.
  */
class AnnFilteredSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb   = Tables.embeddings(spark, TestSpark.sf0001).cache()
  lazy val cents = Ann.ivfDetCentroids(emb, nlist = 16)
  lazy val asg   = Ann.ivfDetAssign(emb, cents).cache()
  lazy val queries = emb.filter(col("vec_id") < 30)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("selective predicate dispatches to the exact pre-filter path") {
    val pred = col("label") === 3
    val got  = Ann.filteredTopK(queries, asg, cents, pred, k = 5, nprobe = 4)
    val exact = Ann.filteredBrute(queries, asg, pred, k = 5)
    assert(got.orderBy("query_id", "rank").collect()
      .sameElements(exact.orderBy("query_id", "rank").collect()),
      "dispatcher must take the pre-filter (exact) path at ~10% selectivity")
    // every returned neighbor satisfies the predicate
    val keep = emb.filter(pred).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pairs(got).forall { case (_, n) => keep(n) })
    // and it IS brute-over-survivors (not an approximation)
    val manual = Ann.bruteCosine(queries, emb.filter(pred), 5, kernel = "fold")
    assert(pairs(got) == pairs(manual))
  }

  test("unselective predicate dispatches to the post-filter oversampled path") {
    val pred = col("label") =!= 3
    val got  = Ann.filteredTopK(queries, asg, cents, pred, k = 5, nprobe = 4)
    val post = Ann.filteredIvf(queries, asg, cents, pred, k = 5, nprobe = 4)
    assert(got.orderBy("query_id", "rank").collect()
      .sameElements(post.orderBy("query_id", "rank").collect()),
      "dispatcher must take the post-filter path at ~90% selectivity")
    val keep = emb.filter(pred).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pairs(got).forall { case (_, n) => keep(n) })
    // post-filter results are a subset of the unfiltered oversampled
    // candidate set — the contract: the filter never reaches PAST the
    // candidate budget for replacements
    val cand = Ann.ivfDetSearch(queries, asg, cents, k = 5 * 4, nprobe = 4)
    assert(pairs(got).subsetOf(pairs(cand)))
    // per-query cardinality never exceeds k
    val maxPer = got.groupBy("query_id").count().agg(max("count")).head().getLong(0)
    assert(maxPer <= 5)
  }

  test("oversample starvation under-fills instead of over-reaching") {
    // force the POST regime onto a rare predicate: the 20-candidate budget
    // (k=5, γ=4, nprobe=4) rarely holds 5 label-3 rows, so queries must
    // come back short — and none may carry a non-matching neighbor
    spark.conf.set("graft.ann.prefilterMaxSel", "0.0")
    try {
      val pred = col("label") === 3
      val got  = Ann.filteredTopK(queries, asg, cents, pred, k = 5, nprobe = 4)
      val keep = emb.filter(pred).select("vec_id").collect().map(_.getLong(0)).toSet
      assert(pairs(got).forall { case (_, n) => keep(n) })
      val perQ = got.groupBy("query_id").count().collect().map(_.getLong(1))
      assert(perQ.forall(_ <= 5))
      assert(perQ.exists(_ < 5) || perQ.isEmpty,
        "a 20-candidate budget over a ~10% predicate should starve somewhere")
    } finally spark.conf.unset("graft.ann.prefilterMaxSel")
  }

  test("post-filter converges to exact at full probe + full budget") {
    val pred = col("label") =!= 3
    val n = emb.count().toInt
    val post = Ann.filteredIvf(queries, asg, cents, pred, k = 5, nprobe = 16,
      oversample = n / 5 + 1)
    val exact = Ann.filteredBrute(queries, asg, pred, k = 5)
    assert(pairs(post) == pairs(exact),
      "nprobe = nlist and a corpus-sized budget must recover the exact result")
  }

  test("IVF incremental insert is LOSSLESS; delete is exact subset search") {
    import graft.functions.GraftCols
    val isNew = GraftCols.md5Mod(
      concat(col("vec_id").cast("string"), lit("|tins")), 8) === 0L
    val oldC = emb.filter(!isNew)
    val c8 = Ann.ivfDetCentroids(oldC, nlist = 8)
    val incremented = Ann.ivfInsert(Ann.ivfDetAssign(oldC, c8), c8, emb.filter(isNew))
    val scratch = Ann.ivfDetAssign(emb, c8)
    // insert: bit-identical to the from-scratch union assignment under the
    // SAME centroids — rows, scores, ranks (the graph add trades recall
    // here; IVF does not)
    val a = Ann.ivfDetSearch(queries, incremented, c8, k = 5, nprobe = 3)
      .orderBy("query_id", "rank").collect()
    val b = Ann.ivfDetSearch(queries, scratch, c8, k = 5, nprobe = 3)
      .orderBy("query_id", "rank").collect()
    assert(a.sameElements(b), "incremental insert diverged from the rebuild")
    // delete: the filtered index IS the survivors' index — full probe
    // recovers the exact filtered result
    val deleted = Ann.ivfDelete(scratch, col("label") === 2)
    val full  = Ann.ivfDetSearch(queries, deleted, c8, k = 5, nprobe = 8)
    val exact = Ann.filteredBrute(queries, emb, col("label") =!= 2, k = 5)
    assert(pairs(full) == pairs(exact),
      "post-delete full-probe search must equal exact search over survivors")
    // null-safe victims: a row whose predicate evaluates to SQL NULL is a
    // SURVIVOR, not a silent casualty
    val withNulls = scratch.withColumn("label",
      when(col("vec_id") % 7 === 0, lit(null)).otherwise(col("label")))
    val kept = Ann.ivfDelete(withNulls, col("label") === 2)
    val expected = withNulls.filter(col("label").isNull || col("label") =!= 2)
    assert(kept.count() == expected.count() &&
      kept.select("vec_id").exceptAll(expected.select("vec_id")).count() == 0,
      "rows with a NULL victim predicate must survive the delete")
  }

  test("pre-filter survivors beyond the broadcast wall fall back to IVF-over-subset") {
    spark.conf.set("graft.ann.broadcastMaxRows", "0")
    try {
      val pred = col("label") === 3
      // nprobe = nlist: the subset search is exact, so the fallback must
      // agree with brute-over-survivors even through the join regime
      val got = Ann.filteredTopK(queries, asg, cents, pred, k = 5, nprobe = 16)
      val exact = Ann.filteredBrute(queries, asg, pred, k = 5)
      assert(pairs(got) == pairs(exact))
    } finally spark.conf.unset("graft.ann.broadcastMaxRows")
  }

  test("pre-filter survivors past the BYTE budget route to IVF-over-subset, never the exact wall") {
    // a rows-only gate would admit survivors Knn.exact's byte wall then
    // rejects (d ≥ 60 corpora between ~7.9M and 10M rows at the defaults);
    // force the mismatch at fixture scale: rows admit, bytes don't. The
    // brute baseline runs BEFORE the tiny budget (it rides the wall too).
    val pred  = col("label") === 3
    val exact = pairs(Ann.filteredBrute(queries, asg, pred, k = 5))
    spark.conf.set("graft.knn.broadcastMaxBytes", "64")
    try {
      // nprobe = nlist: subset search exact — must equal brute-over-survivors
      val got = Ann.filteredTopK(queries, asg, cents, pred, k = 5, nprobe = 16)
      assert(pairs(got) == exact,
        "byte-budget overflow must fall back to IVF subset search, not throw")
    } finally spark.conf.unset("graft.knn.broadcastMaxBytes")
  }

  test("zero survivors return zero rows on both the hinted and unhinted path") {
    val none = col("label") === 99 // matches nothing
    assert(Ann.filteredTopK(queries, asg, cents, none, k = 5, nprobe = 4).count() == 0,
      "unhinted zero-survivor search must return empty, not crash the index build")
    assert(Ann.filteredTopK(queries, asg, cents, none, k = 5, nprobe = 4,
      selectivityHint = Some(0.0)).count() == 0,
      "a zero hint must return empty, matching the measured dispatch")
    // a POSITIVE hint whose reality is empty (the estimate was wrong) must
    // also return empty — the hint drives the regime, never the result
    assert(Ann.filteredTopK(queries, asg, cents, none, k = 5, nprobe = 4,
      selectivityHint = Some(0.1)).count() == 0,
      "an optimistic hint over an empty reality must return empty, not crash")
  }

  test("a tiny positive hint (floors to kept=0) must not erase real survivors") {
    val pred = col("label") === 3 // real survivors exist
    val base = pairs(Ann.filteredTopK(queries, asg, cents, pred, k = 5, nprobe = 4))
    // (h · N).toLong == 0 for h < 1/N — the estimate is tiny but POSITIVE,
    // so the search must still rank the true survivors, identically
    val tiny = pairs(Ann.filteredTopK(queries, asg, cents, pred, k = 5, nprobe = 4,
      selectivityHint = Some(1e-9)))
    assert(tiny == base,
      "a sub-1/N positive hint silently returned a wrong (empty) result")
    // the boundary case of the same invariant: a hint of EXACTLY 0.0 (a
    // stats pipeline rounding a tiny selectivity down) is still only an
    // estimate — it must fall through to the existence probe and rank the
    // real survivors, not short-circuit to empty
    val zero = pairs(Ann.filteredTopK(queries, asg, cents, pred, k = 5, nprobe = 4,
      selectivityHint = Some(0.0)))
    assert(zero == base,
      "a 0.0 hint over a non-empty reality silently erased real survivors")
  }

  test("a selectivity hint skips the counting jobs without changing the dispatch") {
    val pred = col("label") === 3 // selective: the pre-filter (exact) regime
    val unhinted = Ann.filteredTopK(queries, asg, cents, pred, k = 5, nprobe = 4)
    // a hint on the pre-filter side of the gate must land the same path →
    // identical rows (the estimate feeds only the REGIME choice)
    val hinted = Ann.filteredTopK(queries, asg, cents, pred, k = 5, nprobe = 4,
      selectivityHint = Some(0.25))
    assert(pairs(hinted) == pairs(unhinted),
      "a same-side selectivity hint must not change any result")
    // a hint past prefilterMaxSel flips to the post-filter regime — the
    // documented approximate path, same rows as the measured unselective
    // dispatch would produce
    val post = Ann.filteredTopK(queries, asg, cents, pred, k = 5, nprobe = 4,
      selectivityHint = Some(0.9))
    val direct = Ann.filteredIvf(queries, asg, cents, pred, k = 5, nprobe = 4)
    assert(pairs(post) == pairs(direct),
      "an unselective hint must route to the post-filter regime")
  }
}
