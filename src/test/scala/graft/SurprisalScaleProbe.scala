package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the text_surprisal vocab join at the shape the dual regime exists
  * for: a corpus whose unigram vocabulary is too large to broadcast. Scores
  * a synthetic token stream (16 tokens/doc, vocab ≈ rows/8) through the two
  * join regimes — `broadcast(vocab)` vs the plain shuffle equi-join — and
  * checks result parity. Run:
  * `Test/runMain graft.SurprisalScaleProbe [nDocs]` (default 1,000,000).
  *
  * VERDICT (r12, 32 cores, ~1.5–2× ambient load): at 1M docs / 16M tokens /
  * 2M-type vocab the two paths are already at wall-clock parity — broadcast
  * 13.4/36.0/14.2 s per pass (collect + ship a 2M-row broadcast each
  * action) vs shuffle 14.5/14.0/20.1 s; at 3M docs / 6M types broadcast
  * 46.9/38.4/18.9 s vs shuffle 39.5/29.8/28.4 s. Parity 0 diff rows at both
  * scales. The crossover sits in this band even on ONE machine where the
  * "broadcast" never crosses a network — on a cluster the vocab also ships
  * per-executor and hits driver/broadcast memory limits long before
  * wall-clock parity (a 100 TB corpus vocabulary is 10⁸–10⁹ types). The
  * knob default (10⁶ rows) keeps the fixture on the broadcast path and any
  * real corpus on the shuffle path.
  */
object SurprisalScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vocabSize = nDocs * 16 / 8
    // 16 tokens per doc; multiplicative hashing spreads token ids so the
    // frequency distribution has both head and tail types
    val toks = spark.range(nDocs * 16).select(
      (col("id") / 16).cast("long").as("doc_id"),
      concat(lit("t"), pmod(col("id") * 2654435761L, lit(vocabSize))).as("token"))
      .cache()
    toks.count()
    def vocab = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    def tot   = vocab.agg(sum("cnt").as("tot"))
    def score(joined: org.apache.spark.sql.DataFrame) = joined
      .crossJoin(broadcast(tot))
      .withColumn("sm",
        floor((-log(col("cnt").cast("double") / col("tot").cast("double")))
          .cast("float").cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("sm").as("surprisal_micros"))
    def report(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        val r = f.agg(count(lit(1)), sum("surprisal_micros")).collect()
        println(f"$tag%-10s pass$p ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
          s"(${r(0).getLong(0)} docs)")
      }
    report("broadcast") { score(toks.join(broadcast(vocab), "token")) }
    report("shuffle")   { score(toks.join(vocab.hint("shuffle_merge"), "token")) }
    val a = score(toks.join(broadcast(vocab), "token"))
      .select(col("doc_id"), col("surprisal_micros"))
    val b = score(toks.join(vocab.hint("shuffle_merge"), "token"))
      .select(col("doc_id"), col("surprisal_micros").as("sm_b"))
    val diff = a.join(b, "doc_id")
      .filter(col("surprisal_micros") =!= col("sm_b")).count()
    println(s"parity diff rows: $diff (expect 0)")
    spark.stop()
  }
}
