package graft.text

import graft.functions.Hashing
import graft.knn.Knn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for pretraining-corpus hygiene: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale shape: every family is (map → shuffle-on-small-key → filter) — the
  * candidate generation shuffles (doc_id, band_key)-sized rows, never
  * documents; verification joins only candidate pairs. MinHash seeds are
  * md5-keyed so the DuckDB oracle reproduces signatures exactly.
  */
object Dedup {

  /** Exact duplicate groups by content hash; keep_id = min doc id. */
  def exactGroups(df: DataFrame): DataFrame =
    df.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))

  /** Exact dedup: first doc per content hash survives. */
  def dropExactDups(df: DataFrame): DataFrame = {
    val keep = exactGroups(df).select(col("keep_id").as("doc_id"))
    df.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Distinct word-n-gram shingle set of one document as a single-pass UDF:
    * one tokenize, one insertion-ordered hash set. Deliberately a UDF, not
    * the "native" sequence→transform→slice→concat_ws→array_distinct chain:
    * higher-order functions evaluate INTERPRETED (outside whole-stage
    * codegen) and re-evaluate the outer split per lambda element, so the
    * expression form measured ~8× slower (ShingleProbe at sf0.1: 3.0 s vs
    * 0.4 s warm, row-identical output) — the usual functions-over-UDFs rule
    * inverts when the functions are HOFs.
    */
  private[graft] def shingleSetUdf(n: Int) = udf((text: String) => {
    // null text → empty set, preserving the declarative chain's null
    // propagation (no rows) regardless of whether a caller's size(split())
    // guard runs before or after this UDF in the planned order
    if (text == null) Array.empty[String] else {
    // limit -1 keeps trailing empty tokens — exactly Spark's split() and the
    // oracle's string_split (the char-overload split(' ') drops them and
    // would diverge on trailing-space text)
    val ws  = text.split(" ", -1)
    val out = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= ws.length) {
      val sb = new java.lang.StringBuilder(ws(i))
      var j = 1
      while (j < n) { sb.append(' '); sb.append(ws(i + j)); j += 1 }
      out.add(sb.toString)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    out.asScala.toArray
    }
  })

  /** Word n-gram shingles, one row per distinct (doc_id, shingle).
    * Duplicate shingles only occur WITHIN a document, so the set semantics
    * come from the per-row set build — a map-only pass, not a
    * 500k-row distinct shuffle.
    */
  def shingles(df: DataFrame, n: Int): DataFrame = {
    val words = split(col("text"), " ")
    // the <n-word guard mirrors the DuckDB oracle's len(ws) >= n predicate
    // (the UDF would yield an empty set anyway; the filter keeps the
    // semantics explicit and the short-doc rows out of the explode)
    df.filter(size(words) >= n)
      .select(col("doc_id"), explode(shingleSetUdf(n)(col("text"))).as("shingle"))
  }

  /** The minhash universal-hash modulus (the Mersenne prime 2³¹−1): small
    * enough that lane products a·h stay far below int64 overflow on BOTH
    * engines (DuckDB bigint multiplication errors on overflow rather than
    * wrapping), large enough that per-lane min collisions are negligible.
    */
  val MinhashP = 2147483647L

  /** MinHash signatures banded for LSH: numHashes lanes per doc, grouped
    * into `bands` band keys. Returns (doc_id, band, band_key).
    *
    * Computed per-document in one map-only pass (shingle set → signatures →
    * band keys inside a single UDF): zero shuffle for signature generation —
    * the compositional explode/groupBy formulation moves |docs|·shingles·
    * numHashes rows through an exchange (43M rows at sf0.1) for the same
    * result.
    *
    * Hash family: ONE md5 per distinct shingle, reduced to h = 52-bit prefix
    * mod p (p = 2³¹−1), then the numHashes lanes are the universal hashes
    * (a_s·h + b_s) mod p with md5-keyed constants a_s/b_s — the md5 was the
    * per-shingle CPU cost, so deriving lanes arithmetically cuts signature
    * work ~numHashes× versus hashing (seed, shingle) pairs, at identical
    * distribution quality (the mod wraps the product thousands of times, so
    * lanes are not co-monotone). Semantics identical to the SQL mirror in
    * SparkEntry.oracleSql: sig(s) = min over DISTINCT shingles, band_key =
    * md5(decimal sigs of the band joined by '|').
    */
  def minhashBands(df: DataFrame, n: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val p  = MinhashP
    val as = Array.tabulate(numHashes)(s => Hashing.md5Mod(s"minhash-a|$s", p - 1) + 1)
    val bs = Array.tabulate(numHashes)(s => Hashing.md5Mod(s"minhash-b|$s", p))
    val bandsUdf = udf((text: String) => {
      // limit -1: keep trailing empty tokens, matching Spark's split() guard
      // below and the oracle's string_split (see shingleSetUdf); null-safe
      // like shingleSetUdf so plan reorders can't turn a skipped row into
      // an NPE
      val words = if (text == null) Array.empty[String] else text.split(" ", -1)
      val sh    = scala.collection.mutable.HashSet.empty[String]
      var i     = 0
      while (i + n <= words.length) {
        val sb = new java.lang.StringBuilder(words(i))
        var j  = 1
        while (j < n) { sb.append(' '); sb.append(words(i + j)); j += 1 }
        sh += sb.toString
        i += 1
      }
      val sigs = Array.fill(numHashes)(Long.MaxValue)
      sh.foreach { g =>
        val h = java.lang.Long.parseLong(Hashing.md5Hex(g).substring(0, 13), 16) % p
        var s = 0
        while (s < numHashes) {
          val v = (as(s) * h + bs(s)) % p
          if (v < sigs(s)) sigs(s) = v
          s += 1
        }
      }
      (0 until bands).map(b =>
        Hashing.md5Hex(sigs.slice(b * rowsPerBand, (b + 1) * rowsPerBand).mkString("|")))
    })
    df.filter(size(split(col("text"), " ")) >= n) // <n-word docs have no shingles
      .select(col("doc_id"), posexplode(bandsUdf(col("text"))).as(Seq("band", "band_key")))
  }

  /** LSH candidate pairs: docs sharing any band bucket (a < b). */
  def minhashCandidates(df: DataFrame, n: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val b = minhashBands(df, n, numHashes, bands)
    b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** Exact n-gram Jaccard for given pairs (a, b). The intersection join is
    * keyed on (doc, shingle) — the b-side probe never fans out beyond
    * |pairs|·|shingles(a)| — rather than a post-join equality filter.
    */
  def jaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = pairs
      .join(sh.select(col("doc_id").as("a"), col("shingle")), "a")
      .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    pairs.join(common, Seq("a", "b"), "left").na.fill(0L, Seq("common"))
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sza") + col("szb") - col("common")))
  }

  /** EXACT all-pairs n-gram Jaccard ≥ τ via prefix filtering (the
    * PPJoin-family shape): order every doc's shingle set by one global
    * (doc-frequency asc, shingle) order; a pair with J(A,B) ≥ τ has
    * |A∩B| ≥ ceil(τ·|A|), and the O-minimal shared shingle then sits within
    * the first |A| − ceil(τ·|A|) + 1 shingles of A (and likewise of B), so
    * joining PREFIXES only is lossless while shrinking the inverted-index
    * join from hot-shingle quadratic to rare-shingle near-linear — the 100 TB
    * shape of exact similarity self-join. Survivors get full intersection
    * counts (Dedup.jaccard) — candidates only, never all pairs.
    * The +1e-9 guard on the float prefix length can only LENGTHEN a prefix
    * (extra candidates), never drop one (missed pairs).
    */
  def jaccardPairs(df: DataFrame, threshold: Double, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the shingle frame feeds three consumers (doc-frequencies, the ranked
    // prefixes, and the verify join) — persist it once instead of re-running
    // the explode+distinct shuffle per consumer; routed through GraftCache
    // so the bench's between-pass clear() releases it (a bare .cache() here
    // would accumulate executor memory across passes). `sz` (the doc's
    // shingle-set size) is computed INLINE from the per-row set before the
    // explode — a groupBy-count over the exploded rows would re-derive in a
    // corpus-wide shuffle what the row already knows, and every downstream
    // stage (prefix length, both pruning bounds) needs sz on every row
    // anyway (r10: kills the sizes aggregate + two joins).
    val words = split(col("text"), " ")
    val sh = graft.GraftCache.track(
      df.filter(size(words) >= n)
        .withColumn("__shset", shingleSetUdf(n)(col("text")))
        .select(col("doc_id"), size(col("__shset")).cast("long").as("sz"),
          explode(col("__shset")).as("shingle")))
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val prefLen =
      floor(lit(1.0 - threshold) * col("sz") + lit(1e-9)).cast("long") + lit(1L)
    // Only df > 1 shingles can be shared, so only they can produce join
    // rows — AND their rank in the full (df asc, shingle) per-doc order
    // decomposes: every df = 1 shingle sorts BEFORE every shared one, so
    // rk = (sz − n_hot) + rk2, where n_hot is the doc's shared-shingle
    // count and rk2 the rank among shared shingles only. The expensive
    // per-doc sort therefore runs over the shared rows alone — at the
    // 1M-doc JaccardScaleProbe corpus that is ~1.2M rows instead of 58M
    // (57.4M of 58M distinct shingles have df = 1); at fixture scale the
    // two forms coincide (207 of 260k rows are df = 1). Row-identical to
    // ranking the full set then filtering (the df = 1 rows dropped here
    // carry ranks ≤ their doc's prefix boundary but join to nothing).
    val shHot = sh.join(dfreq.filter(col("df") > 1), "shingle")
    val byDoc = Window.partitionBy("doc_id")
    val ranked = shHot
      .withColumn("rk2", row_number().over(byDoc.orderBy(col("df"), col("shingle"))))
      .withColumn("n_hot", count(lit(1)).over(byDoc))
      .withColumn("rk", col("sz") - col("n_hot") + col("rk2"))
    val pre = ranked
      .filter(col("rk") <= prefLen)
      .select(col("doc_id"), col("shingle"), col("sz"), col("rk"))
    // TWO exact pruning bounds over the prefix-join rows; a candidate must
    // satisfy both. Validity rests on both docs sorting their shingle sets
    // by the SAME global (df, shingle) order.
    //
    // (1) Count bound: a shared shingle not in BOTH prefixes sits in at
    // least one doc's suffix, and prefix/suffix crossings can only go one
    // direction per pair (if s1 is in A's prefix and B's suffix while s2 is
    // in A's suffix and B's prefix, then s1 < s2 and s2 < s1 in the global
    // order — impossible). So overlap ≤ ppcnt + max(|suffA|, |suffB|).
    // (least() instead of greatest() would prune true containment-shaped
    // pairs — short doc ⊂ long doc — which the df-asc order makes common,
    // since shared shingles have higher df and sort late.)
    //
    // (2) Positional bound (the real PPJoin filter): for a shared token t at
    // ranks (rkA, rkB), shared tokens ≤ t occupy distinct ranks ≤ rkA in A
    // and ≤ rkB in B (count ≤ min(rkA, rkB)), and shared tokens > t occupy
    // ranks > rkA / > rkB (count ≤ min(szA−rkA, szB−rkB)) — so overlap ≤
    // min(rkA,rkB) + min(szA−rkA, szB−rkB) for EVERY shared prefix token;
    // take the min over the observed ones.
    //
    // Each bound alone is weak (measured at sf0.1, τ=0.4: 90k / 444k of
    // 522k prefix pairs pass); together they prune shapes the other misses
    // (12k pass) before the full verify join runs. J ≥ τ requires overlap ≥
    // τ/(1+τ)·(|A|+|B|); the 1e-9 slacks only ever keep MORE candidates.
    val suffA = greatest(col("sza") - (floor(lit(1.0 - threshold) * col("sza") + lit(1e-9)).cast("long") + lit(1L)), lit(0L))
    val suffB = greatest(col("szb") - (floor(lit(1.0 - threshold) * col("szb") + lit(1e-9)).cast("long") + lit(1L)), lit(0L))
    val required =
      lit(threshold / (1.0 + threshold)) * (col("sza") + col("szb")) - lit(1e-9)
    // (0) Length filter, applied INSIDE the prefix join: overlap ≤ min(|A|,|B|)
    // and J ≥ τ needs overlap ≥ τ/(1+τ)·(|A|+|B|), which together force
    // min(|A|,|B|) ≥ τ·max(|A|,|B|). Size-mismatched pairs die before the
    // candidate aggregate ever sees their rows — at τ=0.4 that is every pair
    // whose docs differ in shingle count by more than 2.5×. The 1e-9 slack
    // only ever KEEPS a borderline pair (extra candidate, never a lost one).
    val cand = pre.as("x").join(pre.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id") &&
          least(col("x.sz"), col("y.sz")) >=
            lit(threshold) * greatest(col("x.sz"), col("y.sz")) - lit(1e-9))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sz").as("sza"), col("y.sz").as("szb"))
      .agg(count(lit(1)).as("ppcnt"),
        min(least(col("x.rk"), col("y.rk")) +
          least(col("x.sz") - col("x.rk"), col("y.sz") - col("y.rk"))).as("posb"))
      .filter(col("ppcnt") + greatest(suffA, suffB) >= required &&
        col("posb") >= required)
      .select(col("a"), col("b"))
    jaccard(cand, sh)
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("common").as("n_common"), col("jaccard"))
  }

  /** MinHash-LSH near-dup pairs with exact-Jaccard verification. The verify
    * rides the keyed (doc_id, shingle) frame through `jaccard` — each doc is
    * tokenized ONCE regardless of how many candidate pairs it appears in (a
    * hub doc in m pairs would otherwise be re-shingled m times), and the
    * intersection join touches candidates only — the all-pairs shingle join
    * is never materialized.
    *
    * The verify shingle frame covers ONLY docs that appear in a candidate
    * pair: LSH candidates are a small fraction of the corpus by design, so
    * exploding + shuffling shingles of every non-candidate doc (for sizes
    * nobody reads) is pure waste — at 100 TB it is the difference between a
    * corpus-sized exchange and a candidates-sized one. The member semi-join
    * is left unhinted so AQE broadcasts it when small.
    */
  def nearDupPairs(df: DataFrame, threshold: Double, n: Int = 3,
                   numHashes: Int = 16, bands: Int = 4): DataFrame = {
    // persisted: consumed by the member-set derivation and as jaccard()'s
    // pairs; GraftCache-tracked so the bench's between-pass clear() releases
    // it (ADVICE r6: bare .cache() frames accumulated across passes)
    val cand = graft.GraftCache.track(minhashCandidates(df, n, numHashes, bands))
    // no distinct: the left_semi join below dedups members for free
    val members = cand.select(col("a").as("doc_id"))
      .unionByName(cand.select(col("b").as("doc_id")))
    // persisted because jaccard() consumes the frame three times (sizes +
    // both join sides) — same pattern as jaccardPairs
    val sh = graft.GraftCache.track(
      shingles(df.join(members, Seq("doc_id"), "left_semi"), n))
    jaccard(cand, sh)
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** SimHash-64 of a token list: per-token 64-bit hash (first 16 md5 hex
    * chars), ±1 bit votes, sign-of-vote fingerprint.
    */
  def simhash64(tokens: Iterable[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = new java.math.BigInteger(Hashing.md5Hex(t).substring(0, 16), 16)
      var b = 0
      while (b < 64) { if (h.testBit(b)) votes(b) += 1 else votes(b) -= 1; b += 1 }
    }
    var f = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) f |= (1L << b); b += 1 }
    f
  }

  val simhashUdf = udf((tokens: Seq[String]) => simhash64(tokens))

  def withSimhash(df: DataFrame): DataFrame =
    df.withColumn("simhash", simhashUdf(split(col("text"), " ")))

  /** SimHash near-dups: LSH on four 16-bit chunks (any equal chunk → pair is
    * a candidate — guarantees recall for hamming ≤ 3 by pigeonhole), then an
    * exact hamming filter via bit_count(xor).
    */
  def simhashPairs(df: DataFrame, maxHamming: Int = 3): DataFrame = {
    val s = withSimhash(df).select(col("doc_id"), col("simhash"))
    val chunks = s.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL)).as("ck"))): _*)).as("cs"))
      .select(col("doc_id"), col("simhash"), col("cs.chunk"), col("cs.ck"))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Near-dup CLUSTERS: connected components over the near-dup pair graph,
    * each clustered doc mapped to its cluster's canonical (minimum) doc id —
    * the transitive "keep one per cluster" semantics per-pair drops cannot
    * express (a~b and b~c collapse into one cluster even when a and c are
    * not directly similar). Docs in no pair are their own canonical and are
    * omitted. Rides KnnGraph.components (min-label propagation, one keyed
    * join + min-aggregate per round, rounds bounded by cluster diameter —
    * the standard distributed connected-components shape).
    */
  def nearDupClusters(df: DataFrame, threshold: Double, n: Int = 3,
                      numHashes: Int = 16, bands: Int = 4): DataFrame =
    nearDupClustersFromPairs(nearDupPairs(df, threshold, n, numHashes, bands))

  /** The clustering half of nearDupClusters, factored over an existing
    * (a, b) pair frame so callers that memoize pairs (the pair frame is a
    * derived artifact of (corpus, τ), shared with the pair query) reuse ONE
    * clustering definition instead of re-deriving the edge mirroring.
    */
  def nearDupClustersFromPairs(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    val seeds = edges.select(col("src").as("vec_id"))
    graft.graph.KnnGraph.components(edges, seeds)
      .select(col("vec_id").as("doc_id"), col("comp").as("canonical_id"))
  }

  /** Cross-corpus MinHash near-dup matches — FUZZY decontamination: corpus
    * docs whose n-gram Jaccard with ANY benchmark doc clears τ
    * (`contamination` flags exact shingle collisions only; a benchmark item
    * paraphrased or lightly edited into the training corpus needs the
    * near-dup rule). Both sides band with the SAME hash family; candidates
    * join on (band, band_key) with the benchmark side broadcast (a held-out
    * eval set is small by nature), and exact-Jaccard verification rides the
    * same candidates-only keyed intersection join as nearDupPairs. Doc-id
    * spaces of the two sides must be disjoint (a held-out benchmark's are).
    *
    * `broadcastBench = false` is the GENERAL cross-corpus mode: when the
    * right side is another full corpus rather than an eval set (e.g.
    * cross-snapshot dedup), no side fits a broadcast — the candidate join
    * becomes an explicit shuffle hash join on the band keys, both sides
    * exchanged once, co-partitioned by (band, band_key). PlanSpec asserts
    * one shape per mode.
    */
  def crossNearDups(docs: DataFrame, bench: DataFrame, threshold: Double, n: Int = 3,
                    numHashes: Int = 16, bands: Int = 4,
                    broadcastBench: Boolean = true): DataFrame = {
    val db = minhashBands(docs, n, numHashes, bands)
    val bb = minhashBands(bench, n, numHashes, bands)
      .select(col("band"), col("band_key"), col("doc_id").as("b"))
    // persisted: feeds the member derivation and jaccard()'s pairs side
    val cand = graft.GraftCache.track(
      (if (broadcastBench) db.join(broadcast(bb), Seq("band", "band_key"))
       else db.join(bb.hint("shuffle_hash"), Seq("band", "band_key")))
        .select(col("doc_id").as("a"), col("b")).distinct())
    val members = cand.select(col("a").as("doc_id"))
      .unionByName(cand.select(col("b").as("doc_id")))
    val sh = graft.GraftCache.track(
      shingles(docs.unionByName(bench).join(members, Seq("doc_id"), "left_semi"), n))
    jaccard(cand, sh)
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Benchmark-contamination screen — the n-gram collision rule used to
    * decontaminate pretraining corpora against evaluation sets: flag every
    * corpus doc sharing ANY word n-gram with a benchmark doc, with the
    * collision count. The benchmark is small by nature, so its distinct
    * shingle set rides a broadcast; the corpus side is a map-only probe —
    * corpus shingles are never shuffled (the 100 TB shape), only the
    * colliding (doc_id, shingle) rows reach the count exchange.
    */
  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 3): DataFrame = {
    val bs = shingles(benchmark, n).select(col("shingle")).distinct()
    shingles(docs, n)
      .join(broadcast(bs), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_collisions"))
  }

  /** Embedding-cosine near-dup pairs over the vector table. */
  def embeddingNearDups(emb: DataFrame, simThreshold: Double, k: Int = 5,
                        kernel: String = "fast"): DataFrame =
    Knn.exact(emb, emb, k + 1, metric = "cosine", kernel = kernel)
      .filter(col("query_id") < col("neighbor_id") && col("dist") >= simThreshold)
      .select(col("query_id").as("a"), col("neighbor_id").as("b"),
        col("dist").as("cosine"))
      .distinct()

  /** Duplicated-SPAN accounting — the exact-substring dedup signal
    * (fixed-length token n-gram spans appearing in MORE THAN ONE document),
    * reported per doc as (n_grams, n_dup_grams, dup_ppm). This is the
    * sliding-window flavor of substring dedup: unlike the distinct-shingle
    * Jaccard family above, every POSITION counts, so a doc that repeats a
    * borrowed span many times scores it many times.
    *
    * Scale shape: spans shuffle as 16-byte md5 keys (never the gram text),
    * with three narrow-row exchanges — per-(gram, doc) position counts
    * (map-side partial agg), per-gram doc counts (tiny rows, again
    * partially aggregated so a boilerplate gram in 10⁶ docs combines
    * map-side), and the per-doc rollup. The cross-doc filter joins the two
    * gram frames on the md5 key; a pathologically common gram skews that
    * join's key, which AQE's skew-split handles (the per-doc counts are
    * already aggregated, so no row explosion — just uneven partitions).
    * dup_ppm is an exact integer division, oracle-identical by construction.
    */
  def spanDupStats(docs: DataFrame, n: Int = 8): DataFrame = {
    val t = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= n)
    val grams = t
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - lit(n - 1))).as("i"))
      .select(col("doc_id"), md5(concat_ws(" ", slice(col("t"), col("i"), lit(n)))).as("k"))
    val perDocGram = grams.groupBy("k", "doc_id").agg(count(lit(1)).as("c"))
    val crossDoc = perDocGram.groupBy("k").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("k")
    val dup = perDocGram.join(crossDoc, "k")
      .groupBy("doc_id").agg(sum("c").as("dup_c"))
    t.select(col("doc_id"), (size(col("t")) - lit(n - 1)).cast("long").as("n_grams"))
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("dup_c"), lit(0L)).as("n_dup_grams"))
      .withColumn("dup_ppm", expr("n_dup_grams * 1000000 div n_grams"))
  }
}
