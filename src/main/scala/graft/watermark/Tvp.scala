package graft.watermark

import graft.functions.{GraftCols, Hashing}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Secret key of the TVP/RS schemes: seed-derived embedding dims + the
  * content-id scale (see Bits.contentId for why scale exists).
  * Reference: `random.sample(range(d), 10)` at watermarking.py:282,351,407 —
  * here the dims derive from the seed by keyed hashing (Hashing.sampleDims).
  */
final case class WmKey(seed: String = "20", numDims: Int = 10, scale: Double = 1000.0) {
  def dims(d: Int): Array[Int] = Hashing.sampleDims(d, numDims, seed)
}

/** TVP / RS watermarking (reference watermarking.py) as pure
  * DataFrame→DataFrame operators over `(vec_id: long, embedding: array<float>)`.
  *
  * Shapes, not loops: the reference's per-bit Python loop
  * (watermarking.py:315–340) is one joined plan here — group stats are an
  * L-row aggregate broadcast back, carrier selection is a windowed rank within
  * each of the L groups, and the embed itself is a single projection. At
  * cluster scale the only shuffles are the groupBy on L keys and the
  * row_number sort within groups.
  */
object Tvp {

  /** A1 (watermarking.py:119–150): content id → md5 group → hidden bit.
    * Input must have (vec_id, embedding); d = embedding length.
    */
  def classify(df: DataFrame, d: Int, l: Int, key: WmKey): DataFrame = {
    val dims = key.dims(d)
    // watermarking.py:42 iterates selected_dims[:-1] — last key dim excluded
    df.withColumn("content_id", GraftCols.contentIdCol(col("embedding"), dims.init.toSeq, key.scale))
      .withColumn("group_id", GraftCols.md5Mod(col("content_id"), l).cast("int"))
      .withColumn("hidden_bit", GraftCols.extractLsb(col("embedding"), dims.toSeq, col("content_id")))
  }

  /** Watermark message as an L-row DataFrame (bit_pos, wm_bit). */
  def bitsDf(spark: SparkSession, wm: String): DataFrame = {
    import spark.implicits._
    wm.zipWithIndex.map { case (c, i) => (i, c.asDigit) }.toDF("bit_pos", "wm_bit")
  }

  /** Per-group deficit (A3, watermarking.py:316–328):
    * need = min(max(0, ceil(strength·n_group) − n_expressing_target), n_candidates).
    * Returns the L-row group plan (group_id, wm_bit, need) — broadcastable.
    */
  def groupNeeds(classified: DataFrame, bits: DataFrame, strength: Double): DataFrame = {
    val stats = classified.groupBy("group_id").agg(
      count(lit(1)).as("n_group"),
      sum(col("hidden_bit")).as("n_one"))
    stats.join(broadcast(bits), stats("group_id") === bits("bit_pos"))
      .withColumn("n_target", when(col("wm_bit") === 1, col("n_one")).otherwise(col("n_group") - col("n_one")))
      .withColumn("n_cand", col("n_group") - col("n_target"))
      .withColumn("need",
        least(greatest(lit(0L), ceil(col("n_group") * lit(strength)).cast("long") - col("n_target")),
          col("n_cand")))
      .select("group_id", "wm_bit", "need", "n_cand")
  }

  private def candidates(classified: DataFrame, needs: DataFrame): DataFrame =
    classified.join(broadcast(needs), "group_id")
      .filter(col("hidden_bit") =!= col("wm_bit"))

  // Carrier selection is dual-regime (see groupedRank): the regime check is a
  // driver-known row count of the classified frame (an upper bound on the
  // candidate set). Memoized per DataFrame identity so grids that reuse one
  // classified frame pay one count job; the count itself prunes every
  // classify projection (no column is needed), so it is near metadata-only.
  private val rowCounts =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[DataFrame, java.lang.Long]())
  private[watermark] def nRows(df: DataFrame): Long =
    rowCounts.computeIfAbsent(df, d => d.count()).longValue()

  /** Below this many input rows the plain L-partition window is both
    * row-identical and cheaper than the bucket-distributed rank (no histogram
    * aggregate, no offset join); above it the bucketed rank is the only
    * skew-safe shape — a group_id window has exactly L partitions at ANY
    * corpus size. Config knob exists for tests to force either path.
    */
  private[graft] def smallRankMax(spark: SparkSession): Long =
    spark.conf.get("graft.rank.smallMaxRows", "1000000").toLong

  /** Global 1-based rank within `parts` in `order`, without a per-part
    * global sort: rank within (parts, bucket) partitions and add the
    * bucket's cumulative offset from one histogram aggregate. `bucket`
    * must be ORDER-CONSISTENT — b(x) < b(y) implies x precedes y in
    * `order` — so (bucket asc, order) is exactly `order` and the result is
    * row-identical to `row_number() over (partition by parts order by
    * order)`. The point: a carrier-selection window partitioned by
    * group_id alone has exactly L (=21) partitions at ANY corpus size —
    * each a single-task ~N/L-row sort at 100 TB; bucketing multiplies the
    * parallelism by the bucket count (~65536) while the histogram side
    * stays |parts|·|buckets| rows. Column names are suffixed with
    * `rankName` so several ranks can stack in one plan.
    *
    * DUAL-REGIME: with `distributed = false` (the caller's driver-known row
    * count is under smallRankMax) this IS the plain per-part window — at
    * fixture scale the bucket machinery costs more than the single-task sort
    * it avoids (measured r8→r9: wm_tvp_roundtrip 0.65→1.43 s). The two paths
    * are row-identical (GroupedRankSpec gates parity under ties/skew).
    */
  private[watermark] def groupedRank(df: DataFrame, parts: Seq[String], bucket: Column,
                                     order: Seq[Column], rankName: String,
                                     distributed: Boolean = true): DataFrame = {
    if (!distributed)
      return df.withColumn(rankName, row_number().over(
        Window.partitionBy(parts.map(col): _*).orderBy(order: _*)).cast("long"))
    val b = s"__b_$rankName"; val off = s"__off_$rankName"; val c = s"__c_$rankName"
    val withB = df.withColumn(b, bucket)
    val offs = withB.groupBy((parts :+ b).map(col): _*).agg(count(lit(1)).as(c))
      .withColumn(off, coalesce(sum(col(c)).over(
        Window.partitionBy(parts.map(col): _*).orderBy(col(b))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((parts :+ b :+ off).map(col): _*)
    withB.join(broadcast(offs), parts :+ b)
      .withColumn(rankName, row_number().over(
          Window.partitionBy((parts :+ b).map(col): _*).orderBy(order: _*))
        .cast("long") + col(off))
      .drop(b, off)
  }

  /** Order-consistent bucket for (`scoreCol` DESC, …) orders: 65536 range
    * slices of [mn, mx] (driver-known bounds), highest score → bucket 0.
    * Degenerate mn == mx → one bucket (plain per-part window).
    */
  private def descScoreBucket(scoreCol: Column, mn: Double, mx: Double): Column =
    if (mx == mn) lit(0)
    else least(greatest(
      floor((lit(mx) - scoreCol.cast("double")) / (mx - mn) * 65535).cast("int"),
      lit(0)), lit(65535))

  /** Order-consistent bucket for (`idCol` ASC, …) orders over long ids. */
  private def ascIdBucket(idCol: Column, mn: Long, mx: Long): Column =
    if (mx == mn) lit(0)
    else least(greatest(
      floor((idCol.cast("double") - mn) / (mx - mn).toDouble * 65535).cast("int"),
      lit(0)), lit(65535))

  /** RS carrier pick (watermarking.py:345–400 via random_select_vectors,
    * :152–165): a uniform `need`-sample per group — here the deterministic
    * keyed-hash order replaces the PRNG (see Hashing).
    * Returns (vec_id, group_id, wm_bit, content_id).
    *
    * Selection = "first `need(group)` candidates in md5 order", but NOT as
    * `row_number() over (partition by group_id order by hash)`: that window
    * has exactly L (=21) partitions regardless of N, so at 100 TB each
    * partition is a ~N/21-row single-task sort — a skew wall the fixture
    * never shows. Instead rank within (group, 4-hex-prefix bucket) — 65536×
    * the parallelism — and add the bucket's cumulative offset from one tiny
    * histogram aggregate. The bucket is a PREFIX of the ordering key, so
    * (bucket asc, hash asc) is exactly hash order and the selection is
    * row-identical to the L-partition window (hex digits sort the same
    * lexicographically and numerically; md5 collisions would be the only
    * divergence and cannot occur across distinct vec_ids in practice —
    * vec_id remains as an explicit final tiebreak).
    */
  def carriersRs(classified: DataFrame, bits: DataFrame, strength: Double, seed: String): DataFrame = {
    val big = nRows(classified) > smallRankMax(classified.sparkSession)
    val cand = candidates(classified, groupNeeds(classified, bits, strength))
      .withColumn("__key", GraftCols.keyedHash(col("vec_id"), lit("rs"), lit(seed)))
    groupedRank(cand, Seq("group_id"),
        conv(substring(col("__key"), 1, 4), 16, 10).cast("int"),
        Seq(col("__key"), col("vec_id")), "__rn", distributed = big)
      .filter(col("__rn") <= col("need"))
      .select("vec_id", "group_id", "wm_bit", "content_id")
  }

  /** RS carrier pick for a whole strength × rep grid in one swept plan: the
    * candidate set (hidden_bit ≠ wm_bit) and each rep's keyed ranking are
    * strength-INdependent, so one window per rep serves every strength, and
    * the per-strength needs all derive from ONE group-stat aggregate — each
    * (strength, rep) cell is then a map-side `rn <= need` filter. Cell
    * selections are identical to carriersRs(strength, seed) row-for-row.
    * Returns (st, rep, vec_id, group_id, wm_bit, content_id).
    */
  def carriersRsSwept(classified: DataFrame, bits: DataFrame, sts: Seq[Double],
                      seeds: Seq[(Int, String)]): DataFrame = {
    val spark = classified.sparkSession
    import spark.implicits._
    val stats = classified.groupBy("group_id").agg(
      count(lit(1)).as("n_group"), sum(col("hidden_bit")).as("n_one"))
    val needsAll = stats.join(broadcast(bits), stats("group_id") === bits("bit_pos"))
      .withColumn("n_target",
        when(col("wm_bit") === 1, col("n_one")).otherwise(col("n_group") - col("n_one")))
      .withColumn("n_cand", col("n_group") - col("n_target"))
      .crossJoin(sts.toDF("st"))
      .withColumn("need",
        least(greatest(lit(0L), ceil(col("n_group") * col("st")).cast("long") - col("n_target")),
          col("n_cand")))
    // the needs side renames its join keys (__gid/__wb) so the join against
    // the same-lineage classified frame is unambiguous — no self-join
    // attribute aliasing for Spark to second-guess
      .select(col("st"), col("group_id").as("__gid"), col("wm_bit").as("__wb"), col("need"))
    val cand = classified.join(
        broadcast(bits.select(col("bit_pos").as("group_id"), col("wm_bit"))), "group_id")
      .filter(col("hidden_bit") =!= col("wm_bit"))
    val big = nRows(classified) > smallRankMax(spark)
    val rankedBySeed = seeds.map { case (rep, seed) =>
      val withKey = cand.withColumn("__key",
        GraftCols.keyedHash(col("vec_id"), lit("rs"), lit(seed)))
      groupedRank(withKey, Seq("group_id"),
          conv(substring(col("__key"), 1, 4), 16, 10).cast("int"),
          Seq(col("__key"), col("vec_id")), "rn", distributed = big)
        .drop("__key")
        .withColumn("rep", lit(rep))
    }.reduce(_ unionByName _)
    rankedBySeed.join(broadcast(needsAll),
        col("group_id") === col("__gid") && col("wm_bit") === col("__wb"))
      .filter(col("rn") <= col("need"))
      .select(col("st"), col("rep"), col("vec_id"), col("group_id"),
        col("wm_bit"), col("content_id"))
  }

  /** TVP carrier pick (`select_by_ai`, watermarking.py:203–246). Two phases:
    * candidates whose accessibility index clears the rank-`th` threshold, in
    * vec_id order (the reference's scan order); then, if short, the rest in
    * ai-descending order. `ai` is (vec_id, ai).
    */
  def carriersAi(classified: DataFrame, bits: DataFrame, strength: Double,
                 th: Double, ai: DataFrame): DataFrame = {
    val big = nRows(classified) > smallRankMax(classified.sparkSession)
    // order-consistent bucket bounds from the AI FRAME (a superset of the
    // candidate set, usually already persisted by the caller's memo) — same
    // driver-known-regime decision as Knn's broadcast-index bound, and no
    // extra evaluation of the candidate lineage. Small regime skips the
    // bounds job entirely (the plain window needs no buckets).
    val (aiB, idB) = if (!big) (lit(0), lit(0)) else {
      val mm = ai.agg(min(col("ai")).cast("double"), max(col("ai")).cast("double"),
        min(col("vec_id")), max(col("vec_id"))).head()
      (descScoreBucket(col("ai"), mm.getDouble(0), mm.getDouble(1)),
        ascIdBucket(col("vec_id"), mm.getLong(2), mm.getLong(3)))
    }
    val cand = candidates(classified, groupNeeds(classified, bits, strength))
      .join(ai.select(col("vec_id"), col("ai")), "vec_id")
    // ONE ai-descending rank serves both phases, checkpointed in BOTH
    // regimes: thr/n_qual/phase1/phase2 are four consumers of this frame,
    // and without the checkpoint each re-runs the classify+join+rank chain
    // (measured r10: wm_tvp_carriers 1.8 → 3.7 s when the small regime
    // briefly dropped it; the one materialization costs far less).
    // Phase split: qual ⟺ ai ≥ thr_ai, and rn_ai orders by ai first, so
    // every qual row strictly precedes every non-qual row — qual ⟺
    // rn_ai ≤ n_qual, and the phase-2 ai-descending rank WITHIN the
    // non-qual rows is just rn_ai − n_qual. Only the phase-1 scan-order
    // (vec_id) rank needs a second ranking pass, over qual rows only.
    val ranked = graft.GraftCache.stage(
      groupedRank(cand, Seq("group_id"), aiB,
        Seq(col("ai").desc, col("vec_id")), "rn_ai", distributed = big))
    // threshold_ai = ai at (1-based) rank floor(n_cand*th); rank 0 → -inf.
    // The rank compare stays long — an int cast would wrap past 2^31
    // candidate rows per group and silently pick the wrong threshold.
    val thr = ranked.filter(col("rn_ai") === floor(col("n_cand") * lit(th)).cast("long"))
      .select(col("group_id"), col("ai").as("thr_ai"))
    val withThr = ranked.join(broadcast(thr), Seq("group_id"), "left")
      .withColumn("qual", col("thr_ai").isNull || col("ai") >= col("thr_ai"))
    val nQual = withThr.filter(col("qual")).groupBy("group_id")
      .agg(count(lit(1)).as("n_qual"))
    val base = withThr.join(broadcast(nQual), Seq("group_id"), "left")
      .na.fill(0L, Seq("n_qual"))
    val phase1 = groupedRank(base.filter(col("qual")), Seq("group_id"), idB,
        Seq(col("vec_id")), "rn1", distributed = big)
      .filter(col("rn1") <= col("need"))
      .select("vec_id", "group_id", "wm_bit", "content_id")
    val phase2 = base.filter(!col("qual"))
      .filter(col("rn_ai") - col("n_qual") <=
        col("need") - least(col("need"), col("n_qual")))
      .select("vec_id", "group_id", "wm_bit", "content_id")
    phase1.unionByName(phase2)
  }

  /** carriersAi for a whole THRESHOLD GRID in one plan: the candidate set
    * and its ai-descending ranks are th-independent, so they are computed
    * once and crossed with a broadcast th dimension; every window/join below
    * just gains `th` in its partition key. Selection per th is identical to
    * carriersAi(th) row-for-row (property-tested), but a 10-point sweep costs
    * one plan instead of ten — at fixture scale the per-th window/broadcast
    * latency dominates the sweep, and at cluster scale this turns ten
    * shuffle cascades into one.
    * Returns (th, vec_id, group_id, wm_bit, content_id).
    */
  def carriersAiSwept(classified: DataFrame, bits: DataFrame, strength: Double,
                      ths: Seq[Double], ai: DataFrame): DataFrame = {
    val spark = classified.sparkSession
    import spark.implicits._
    val cand = candidates(classified, groupNeeds(classified, bits, strength))
      .join(ai.select(col("vec_id"), col("ai")), "vec_id")
    // windows here keep the grid in ONE fused lazy plan (the sweep's whole
    // point at fixture scale); at 100 TB a th-sweep would ride the
    // checkpointed two-phase carriersAi per th instead (see carriersAi) —
    // selections are property-tested identical, so the two shapes are
    // interchangeable per regime
    val wAi = Window.partitionBy(col("group_id")).orderBy(col("ai").desc, col("vec_id"))
    val ranked = cand.withColumn("rn_ai", row_number().over(wAi))
      .crossJoin(broadcast(ths.toDF("th")))
    val thr = ranked.filter(col("rn_ai") === floor(col("n_cand") * col("th")).cast("long"))
      .select(col("th").as("t_th"), col("group_id").as("t_gid"), col("ai").as("thr_ai"))
    val withThr = ranked.join(broadcast(thr),
        col("th") === col("t_th") && col("group_id") === col("t_gid"), "left")
      .drop("t_th", "t_gid")
      .withColumn("qual", col("thr_ai").isNull || col("ai") >= col("thr_ai"))
    val w1 = Window.partitionBy(col("th"), col("group_id"), col("qual")).orderBy(col("vec_id"))
    val w2 = Window.partitionBy(col("th"), col("group_id"), col("qual")).orderBy(col("ai").desc, col("vec_id"))
    val nQual = withThr.filter(col("qual")).groupBy("th", "group_id")
      .agg(count(lit(1)).as("n_qual"))
    withThr.join(broadcast(nQual), Seq("th", "group_id"), "left")
      .na.fill(0L, Seq("n_qual"))
      .withColumn("rn1", row_number().over(w1))
      .withColumn("rn2", row_number().over(w2))
      .filter(
        (col("qual") && col("rn1") <= col("need")) ||
        (!col("qual") && col("rn2") <= col("need") - least(col("need"), col("n_qual"))))
      .select("th", "vec_id", "group_id", "wm_bit", "content_id")
  }

  /** Apply the LSB embed to the selected carriers (watermarking.py:332–340):
    * one projection — `when(carrier, embedLsb(...)).otherwise(embedding)`.
    * Content ids are the ones computed on the ORIGINAL vectors (as in the
    * reference, where the carrier dim skips every key dim so the id is stable
    * under embedding). Returns the watermarked table (vec_id, embedding).
    */
  def applyEmbed(df: DataFrame, carriers: DataFrame, d: Int, key: WmKey): DataFrame =
    applyEmbedTagged(df, carriers, d, key, Nil)

  /** applyEmbed over a TAGGED frame: joins on vec_id PLUS the given cell-tag
    * columns, so one plan embeds every cell of a swept carrier grid (each
    * tagged copy of a row flips only by its own cell's carriers).
    */
  def applyEmbedTagged(df: DataFrame, carriers: DataFrame, d: Int, key: WmKey,
                       tags: Seq[String]): DataFrame = {
    val dims = key.dims(d).toSeq
    val c = carriers.select(col("vec_id") +: col("wm_bit") +:
      col("content_id").as("carrier_cid") +: tags.map(col): _*)
    df.join(c, Seq("vec_id") ++ tags, "left")
      .withColumn("embedding",
        when(col("wm_bit").isNotNull,
          GraftCols.embedLsb(col("embedding"), col("wm_bit"), dims, col("carrier_cid")))
        .otherwise(col("embedding")))
      .drop("wm_bit", "carrier_cid")
  }

  /** RS end-to-end embed (reference `watermark_embedding`, watermarking.py:345–400). */
  def embedRs(df: DataFrame, wm: String, strength: Double, d: Int, key: WmKey): DataFrame = {
    val spark = df.sparkSession
    val classified = classify(df, d, wm.length, key)
    val carriers = carriersRs(classified, bitsDf(spark, wm), strength, key.seed)
    applyEmbed(df, carriers, d, key)
  }

  /** TVP end-to-end embed (reference `watermark_embedding_by_ai`,
    * watermarking.py:275–342); `ai` = accessibility indices (vec_id, ai).
    */
  def embedAi(df: DataFrame, wm: String, strength: Double, th: Double,
              ai: DataFrame, d: Int, key: WmKey): DataFrame = {
    val spark = df.sparkSession
    val classified = classify(df, d, wm.length, key)
    val carriers = carriersAi(classified, bitsDf(spark, wm), strength, th, ai)
    applyEmbed(df, carriers, d, key)
  }

  /** A2 — per-group majority vote over any classified frame
    * (group_id, hidden_bit); empty groups read "0" (the reference's dict is
    * pre-seeded 0..L-1, watermarking.py:121,415–425).
    * Returns (bit_pos, extracted_bit).
    */
  def majorityVote(classified: DataFrame, l: Int): DataFrame = {
    val spark = classified.sparkSession
    val votes = classified
      .groupBy("group_id")
      .agg(sum("hidden_bit").as("n_one"), count(lit(1)).as("n"))
      .withColumn("extracted_bit", when(col("n_one") * 2 > col("n"), 1).otherwise(0))
    spark.range(l).select(col("id").cast("int").as("bit_pos"))
      .join(votes.select(col("group_id"), col("extracted_bit")),
        col("bit_pos") === col("group_id"), "left")
      .select(col("bit_pos"), coalesce(col("extracted_bit"), lit(0)).as("extracted_bit"))
  }

  /** Blind extraction (E2, watermarking.py:402–427): regroup, majority vote. */
  def extract(df: DataFrame, l: Int, d: Int, key: WmKey): DataFrame =
    majorityVote(classify(df, d, l, key), l)

  /** A7 bit-error rate (watermarking.py:445–451). */
  def ber(bits: DataFrame, extracted: DataFrame): Double =
    bits.join(extracted, "bit_pos")
      .agg(avg((col("wm_bit") =!= col("extracted_bit")).cast("int")))
      .head().getDouble(0)
}
