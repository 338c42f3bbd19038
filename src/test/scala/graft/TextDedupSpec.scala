package graft

import graft.events.EventOps
import graft.text.{Dedup, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs  = Tables.documents(spark, TestSpark.sf0001).cache()

  test("fingerprint: deterministic Horner hash") {
    assert(TextOps.fingerprint("") == 0L)
    assert(TextOps.fingerprint("a") == 97L)
    assert(TextOps.fingerprint("ab") == 97L * 31 + 98)
    assert(TextOps.fingerprint("spark") == TextOps.fingerprint("spark"))
    assert(TextOps.fingerprint("spark") != TextOps.fingerprint("spars"))
  }

  test("simhash: identical texts collide, different texts differ") {
    val a = Dedup.simhash64(Seq("the", "quick", "brown", "fox"))
    assert(a == Dedup.simhash64(Seq("the", "quick", "brown", "fox")))
    val b = Dedup.simhash64(Seq("the", "quick", "brown", "cat"))
    val hamming = java.lang.Long.bitCount(a ^ b)
    assert(hamming > 0 && hamming < 32, s"near-dup hamming should be small-ish: $hamming")
    val far = Dedup.simhash64(Seq("completely", "unrelated", "words", "here"))
    assert(java.lang.Long.bitCount(a ^ far) >= hamming)
  }

  test("minhash near-dups find planted duplicates and score them highest") {
    import spark.implicits._
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().take(20)
    // plant: doc 9000 = copy of texts(0) with one word changed
    val planted = (9000L, texts(0)._2.replaceFirst("\\w+", "zzz"))
    val df = spark.createDataFrame(texts :+ planted).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(df, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, j) => a == texts(0)._1 && b == 9000L && j > 0.8 },
      s"planted dup not found: ${pairs.mkString(",")}")
  }

  test("prefix-filtered jaccard join is lossless vs the naive all-pairs form") {
    import spark.implicits._
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().take(30)
    val planted = (9000L, texts(0)._2.replaceFirst("\\w+", "zzz"))
    val df = spark.createDataFrame(texts :+ planted).toDF("doc_id", "text")
    // naive ground truth: every (a, b) pair scored via the exact shingle join
    val sh  = Dedup.shingles(df.filter(size(split(col("text"), " ")) >= 3), 3)
    val ids = df.select(col("doc_id")).as[Long].collect().sorted
    val allPairs = ids.flatMap(a => ids.filter(_ > a).map(b => (a, b)))
      .toSeq.toDF("a", "b")
    val naive = Dedup.jaccard(allPairs, sh).filter(col("jaccard") >= 0.4)
      .select("a", "b", "common").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fast = Dedup.jaccardPairs(df, threshold = 0.4)
      .select("a", "b", "n_common").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == naive, s"prefix filter diverged: missing=${naive -- fast} extra=${fast -- naive}")
    assert(fast.exists { case (a, b, _) => a == texts(0)._1 && b == 9000L },
      "planted near-dup not found by the prefix-filtered join")
  }

  test("jaccard join keeps containment-shaped pairs (short doc ⊂ long doc)") {
    import spark.implicits._
    // B: 12 distinct words → 10 shingles; A: B's last 7 words → 5 shingles,
    // ALL shared with B. Shared shingles have df=2 and sort LAST in the
    // (df asc, shingle) prefix order — the regime where a least(suffA, suffB)
    // count filter under-bounds the overlap (ppcnt=2 + min(1,3)=3 < 4.29
    // required) and silently dropped the true J=0.5 ≥ τ=0.4 pair.
    val bWords = (1 to 12).map(i => f"w$i%02d")
    val long   = bWords.mkString(" ")
    val short  = bWords.drop(5).mkString(" ")
    val df = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val fast = Dedup.jaccardPairs(df, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(fast.exists { case (a, b, j) => a == 1L && b == 2L && math.abs(j - 0.5) < 1e-12 },
      s"containment pair dropped by the count filter: ${fast.mkString(",")}")
    // and it still agrees with the naive all-pairs ground truth
    val sh    = Dedup.shingles(df, 3)
    val naive = Dedup.jaccard(Seq((1L, 2L)).toDF("a", "b"), sh)
      .filter(col("jaccard") >= 0.4).count()
    assert(naive == fast.length)
  }

  test("near-dup clusters: a~b~c chains collapse to one canonical doc") {
    import spark.implicits._
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().take(10)
    val base  = texts(0)._2
    // chain: 9001 ~ base (1 word changed), 9002 ~ 9001 (2 words changed) —
    // 9002 is farther from base than from 9001, but all three must share a
    // cluster with canonical = the original doc id
    val m1 = base.replaceFirst("\\w+", "zza")
    val m2 = m1.replaceAll("(\\w+)$", "zzb")
    val df = spark.createDataFrame(texts ++ Seq((9001L, m1), (9002L, m2)))
      .toDF("doc_id", "text")
    val cl = Dedup.nearDupClusters(df, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val canon = texts(0)._1
    assert(cl.get(9001L).contains(canon) && cl.get(9002L).contains(canon)
      && cl.get(canon).contains(canon), s"chain not collapsed: $cl")
    // unrelated docs are not clustered
    assert(!cl.contains(texts(5)._1))
  }

  test("contamination screen flags docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx yy alpha beta gamma zz"), // shares trigram "alpha beta gamma"
      (2L, "totally different words here"),
      (3L, "beta gamma delta and more tail")) // shares "beta gamma delta"
      .toDF("doc_id", "text")
    val got = Dedup.contamination(corpus, bench, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 3L -> 1L), s"got $got")
    // broadcast-probe shape: no shuffle of the corpus shingle side beyond
    // the colliding-rows aggregate — the benchmark join must be broadcast
    val plan = Dedup.contamination(corpus, bench, 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("cross-corpus near-dup catches a lightly-edited benchmark leak") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val bench = Seq((100L, base)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, base.replace("w15", "edited")), // one-word edit: J ≈ 24/36 ≈ 0.67
      (2L, "totally different words here today now"),
      (3L, (40 to 70).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.crossNearDups(corpus, bench, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 100L)), s"got ${got.toSeq}")
    // benchmark side banded frame must broadcast (held-out sets are small)
    val plan = Dedup.crossNearDups(corpus, bench, 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    GraftCache.clear()
  }

  test("exact dedup drops nothing on the (dup-free) fixture, drops planted dups") {
    assert(Dedup.dropExactDups(docs).count() == docs.count())
    val doubled = docs.union(docs.limit(10).withColumn("doc_id", col("doc_id") + 100000))
    assert(Dedup.dropExactDups(doubled).count() == docs.count())
  }

  test("sessions: durations nonnegative, gaps within sessions <= gap") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val st = EventOps.sessionStats(ev, gapSec = 1800).cache()
    assert(st.filter(col("duration_sec") < 0).count() == 0)
    assert(st.count() > 0)
    // every event belongs to exactly one session
    assert(st.agg(sum("n_events")).head.getLong(0) == ev.count())
    // within a session, max gap <= 1800 by construction: check session spans
    val sess = EventOps.sessionize(ev, 1800)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "session_seq").orderBy("ts_ns")
    val gaps = sess.withColumn("gap",
      EventOps.epochSecNs(col("ts_ns")) - lag(EventOps.epochSecNs(col("ts_ns")), 1).over(w))
    assert(gaps.filter(col("gap") > 1800).count() == 0)
  }

  test("shingle UDF is row-identical to the declarative HOF construction") {
    // Dedup.shingles moved to a single-pass UDF for speed (ShingleProbe:
    // the interpreted HOF chain measured ~8×); this pins the semantics to
    // the declarative form so the fast path can never drift — including
    // multi-space runs (empty tokens inside shingles) and <n-word docs.
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b  c d"), // double space → empty token preserved in shingles
      (3L, "x y"),      // < n words → no rows
      (4L, "a a a a"),  // per-doc duplicate shingles → one row each
      (6L, "p q r "),   // trailing space → trailing empty token kept
      (5L, "solo tokens only here")).toDF("doc_id", "text")
    val n = 3
    val words = split(col("text"), " ")
    val hof = docs.filter(size(words) >= n)
      .select(col("doc_id"),
        explode(array_distinct(transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))))).as("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val udfRows = graft.text.Dedup.shingles(docs, n)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(udfRows.sameElements(hof), "UDF shingles diverged from the HOF form")
    // and on real fixture text
    val real = Tables.documents(spark, TestSpark.sf0001).limit(200)
    val rHof = real.filter(size(words) >= n)
      .select(col("doc_id"),
        explode(array_distinct(transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))))).as("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val rUdf = graft.text.Dedup.shingles(real, n)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(rUdf.sameElements(rHof))
  }

  test("two-level prefix rank equals ranking the full shingle set then filtering") {
    // jaccardPairs ranks ONLY df>1 rows and reconstitutes the full-order
    // rank as (sz − n_hot) + rk2 (every df=1 shingle sorts first). This
    // pins that decomposition to the direct form on real fixture text.
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val threshold = 0.4
    val base = graft.text.Dedup.shingles(docs, 3)
    val szs = base.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val withSz = base.join(szs, "doc_id")
    val dfreq = withSz.groupBy("shingle").agg(count(lit(1)).as("df"))
    val prefLen = floor(lit(1.0 - threshold) * col("sz") + lit(1e-9)).cast("long") + lit(1L)
    val full = withSz.join(dfreq, "shingle")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))))
      .filter(col("rk") <= prefLen && col("df") > 1)
      .select(col("doc_id"), col("shingle"), col("sz"), col("rk").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sorted
    val byDoc = Window.partitionBy("doc_id")
    val two = withSz.join(dfreq.filter(col("df") > 1), "shingle")
      .withColumn("rk2", row_number().over(byDoc.orderBy(col("df"), col("shingle"))))
      .withColumn("n_hot", count(lit(1)).over(byDoc))
      .withColumn("rk", col("sz") - col("n_hot") + col("rk2"))
      .filter(col("rk") <= prefLen)
      .select(col("doc_id"), col("shingle"), col("sz"), col("rk").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sorted
    assert(full.nonEmpty && two.sameElements(full),
      s"two-level rank diverged: full=${full.length} two=${two.length}")
  }

  test("spanDupStats counts every position of a cross-doc span, per doc") {
    import spark.implicits._
    // 10-token docs; A and B share one 8-token span (two positions in A's
    // repeat-doc C count twice); D is all-unique.
    val span = "s1 s2 s3 s4 s5 s6 s7 s8"
    val df = Seq(
      (1L, s"a0 $span a9"),            // positions 1..3: a0-start, span, tail — grams: 3
      (2L, s"b0 b1 $span"),            // span at the end
      (3L, s"$span $span"),            // 16 tokens: the span twice → 9 grams, ALL dup
      (4L, "d0 d1 d2 d3 d4 d5 d6 d7 d8 d9")).toDF("doc_id", "text")
    val got = Dedup.spanDupStats(df, n = 8).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: grams at pos 1..3; only pos 2 equals the span → 1 dup of 3
    assert(got(0) == (1L, 3L, 1L, 333333L), s"doc1: ${got(0)}")
    assert(got(1) == (2L, 3L, 1L, 333333L), s"doc2: ${got(1)}")
    // doc 3: 9 grams; pos 1 and 9 are the span (2 hits); the 7 straddling
    // grams (s2..s8 s1, …) occur only inside doc 3, so they are not
    // cross-doc dups and only the 2 span positions count.
    assert(got(2) == (3L, 9L, 2L, 222222L), s"doc3: ${got(2)}")
    assert(got(3) == (4L, 3L, 0L, 0L), s"doc4: ${got(3)}")
  }

  test("bm25: rare term outranks common ones; topK tournament is exact") {
    import spark.implicits._
    val df = Seq(
      (1L, "rare common common common"),
      (2L, "common common common common"),
      (3L, "rare rare common filler"),
      (4L, "filler filler filler filler")).toDF("doc_id", "text")
    val q = Seq(0 -> "rare", 0 -> "common").toDF("query_id", "term")
    val scored = graft.text.Bm25.scores(df, q)
    val got = graft.text.Bm25.topK(scored, k = 3).orderBy("rank")
      .select("rank", "doc_id").as[(Long, Long)].collect()
    // df(rare)=2 of 4 docs, df(common)=3: idf(rare) > idf(common); doc 3 has
    // rare tf=2 → top; docs 1 (rare+common) next; doc 2 (common only) last.
    assert(got.map(_._2).toSeq == Seq(3L, 1L, 2L), s"ranking: ${got.mkString(",")}")
    // tournament equals the naive global sort on the same scored frame
    val naive = scored.orderBy(col("query_id"), col("score_micros").desc, col("doc_id"))
      .limit(3).select("doc_id").as[Long].collect().toSeq
    assert(got.map(_._2).toSeq == naive)
  }

  test("langId picks a profile language deterministically") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze ist von haus"),
      (3L, "el gato y la casa de los perros")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "es"))
  }
}
