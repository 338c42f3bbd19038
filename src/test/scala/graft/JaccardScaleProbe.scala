package graft
import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the prefix-filtered exact Jaccard join: 100k synthetic
  * 60-word documents (keyed-random tokens over a 5k vocab — shingles are
  * mostly rare, the regime prefix filtering is built for), with one planted
  * near-duplicate per 100 docs (one word mutated). Reports wall time,
  * candidate behavior, and that every planted pair is recovered.
  * Run: `sbt "Test/runMain graft.JaccardScaleProbe"`.
  */
object JaccardScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 100000
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
    val t0 = System.nanoTime()
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.8).cache()
    val found = pairs.count()
    val dt = (System.nanoTime() - t0) / 1e9
    val planted = pairs.filter(col("b") === col("a") + 1 && pmod(col("b"), lit(100)) === 1).count()
    val expected = (1 until n).count(_ % 100 == 1)
    println(f"JACCARD-SCALE n=$n: $dt%.1f s, $found pairs (planted recovered: $planted/$expected)")
    assert(planted == expected, s"missed planted dups: $planted of $expected")
    spark.stop()
  }
}
