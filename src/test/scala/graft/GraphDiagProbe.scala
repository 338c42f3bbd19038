package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot diagnostic over a SAVED GraphAnnScaleProbe build: how much of
  * the exact top-10 is present as DIRECT base edges (graph quality), and
  * how much is within the 2-hop closure of the true-neighbor set — the
  * ceiling any beam search over this artifact can reach vs the price of
  * its construction. Run: Test/runMain graft.GraphDiagProbe <dir>
  */
object GraphDiagProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = spark.read.parquet(s"$dir/exact").localCheckpoint() // (query_id, neighbor_id)
    val base  = spark.read.parquet(s"$dir/base").select("src", "dst").localCheckpoint()
    val nExact = exact.count()
    // direct edge recall: true pair present as query -> neighbor edge
    val direct = exact.join(base,
      exact("query_id") === base("src") && exact("neighbor_id") === base("dst"),
      "left_semi").count()
    println(f"[gdiag] exact pairs $nExact%,d; direct-edge hits $direct%,d (${direct.toDouble / nExact}%.4f)")
    // 2-hop: neighbor reachable via any intermediate (query->m, m->neighbor)
    val qEdges = base.join(exact.select(col("query_id")).distinct(),
      base("src") === col("query_id")).select(col("query_id"), col("dst").as("mid"))
    val twoHop = exact.join(
      qEdges.join(base, qEdges("mid") === base("src"))
        .select(col("query_id").as("q2"), col("dst").as("n2")).distinct(),
      exact("query_id") === col("q2") && exact("neighbor_id") === col("n2"),
      "left_semi").count()
    println(f"[gdiag] 2-hop-reachable hits $twoHop%,d (${twoHop.toDouble / nExact}%.4f)")
    spark.stop()
  }
}
