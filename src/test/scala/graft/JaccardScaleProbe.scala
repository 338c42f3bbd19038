package graft
import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the prefix-filtered exact Jaccard join: synthetic 60-word
  * documents (keyed-random tokens over a 5k vocab — shingles are mostly
  * rare, the regime prefix filtering is built for), with one planted
  * near-duplicate per 100 docs (one word mutated). Reports wall time, a
  * stage breakdown (shingle build vs the global doc-frequency aggregate vs
  * the rest of the pipeline — the r6 verdict asked which dominates at 10×),
  * and that every planted pair is recovered.
  * Run: `sbt "Test/runMain graft.JaccardScaleProbe [nDocs]"` (default 100k;
  * pass 1000000 for the 10× probe).
  */
object JaccardScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val gen = udf((id: Long) => {
      val base = if (id % 100 == 1) id - 1 else id // id≡1 (mod 100): near-dup of id−1
      val words = Array.tabulate(60)(j =>
        "w" + graft.functions.Hashing.md5Mod(s"doc$base/$j", 5000))
      if (id % 100 == 1) words(0) = "mutated"
      words.mkString(" ")
    })
    val docs = spark.range(n)
      .select(col("id").as("doc_id"), gen(col("id")).as("text")).cache()
    docs.count()
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // stage attribution, isolated on a cached shingle frame: (a) tokenize +
    // explode, (b) the global dfreq aggregate (the one corpus-wide shingle
    // shuffle exact PPJoin needs — Spark already partial-aggregates map-side)
    val sh = Dedup.shingles(docs, 3).cache()
    val (nSh, tSh)     = timed(sh.count())
    val (nDist, tDf)   = timed(sh.groupBy("shingle").count().count())
    val (nHot, tHot)   = timed(sh.groupBy("shingle").count().filter(col("count") > 1).count())
    sh.unpersist()
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.8).cache()
    val (found, tAll) = timed(pairs.count())
    val planted = pairs.filter(col("b") === col("a") + 1 && pmod(col("b"), lit(100)) === 1).count()
    val expected = (1 until n).count(_ % 100 == 1)
    println(f"JACCARD-SCALE n=$n: total=$tAll%.1f s, $found pairs " +
      f"(planted recovered: $planted/$expected)")
    println(f"JACCARD-STAGES n=$n: shingles=$tSh%.1f s ($nSh rows), " +
      f"dfreq=$tDf%.1f s ($nDist distinct), hot-filter=$tHot%.1f s ($nHot df>1), " +
      f"rest=${tAll - tSh - tDf}%.1f s (prefix join + verify, by subtraction)")
    assert(planted == expected, s"missed planted dups: $planted of $expected")
    spark.stop()
  }
}
