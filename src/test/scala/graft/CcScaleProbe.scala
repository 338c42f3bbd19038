package graft

import graft.graph.KnnGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The round-complexity evidence for the alternating-stars components: a
  * PATH graph (diameter = n) at 100k nodes. Run:
  * `Test/runMain graft.CcScaleProbe [nNodes]`.
  *
  * Min-label propagation moves a label ONE HOP per round — on a path the
  * smallest label needs n rounds to reach the far end, so any practical
  * round cap trips with the job <0.1% done. The stars contract the graph
  * toward component minima geometrically: O(log² n) rounds. Both paths are
  * exact algorithms; this is purely a round-count (and therefore
  * shuffle-count) difference, the thing that decides feasibility at 100 TB
  * on lineage chains, session grids, road networks — any high-diameter
  * graph.
  */
object CcScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = spark.range(n - 1).select(col("id").as("src"), (col("id") + 1L).as("dst"))
    val t0 = System.nanoTime()
    val cc = KnnGraph.componentsUndirected(path, maxIter = 60)
    val comps = cc.groupBy("comp").agg(count(lit(1)).as("cnt")).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    require(comps.length == 1 && comps(0).getLong(1) == n,
      s"path must be ONE component of $n nodes: ${comps.toSeq}")
    println(f"stars: $n%d-node path converged in ${KnnGraph.lastStarRounds}%d rounds, $secs%.1f s")

    // min-label propagation on the same (symmetrized) path, same 60-round
    // cap: the fixpoint witness must trip — the label needs n hops
    val sym = path.union(path.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = spark.range(n).select(col("id").as("vec_id"))
    val trip = try {
      KnnGraph.components(sym, seeds, maxIter = 60); None
    } catch { case e: IllegalArgumentException => Some(e.getMessage) }
    require(trip.nonEmpty, "propagation converged?! the path should need n rounds")
    println(s"min-label propagation: tripped its cap as expected (${trip.get.take(80)}...)")
    spark.stop()
  }
}
