package graft

import graft.ann.Ann
import graft.sources.TableLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Index-as-table: the IVF assignment persisted as a cluster-partitioned
  * TableLog table, so nprobe is MANIFEST-level partition pruning. The
  * driver query (ann_ivf_log_topk) gates row equality under the oracle;
  * this spec pins the pruning arithmetic the query relies on.
  */
class IvfLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("probe set resolves exactly its clusters' dirs; pruned search is bit-identical") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001).cache()
    val cents = Ann.ivfDetCentroids(emb, nlist = 16)
    val assigned = Ann.ivfDetAssign(emb, cents).cache()
    val t = java.nio.file.Files.createTempDirectory("graft_ivflog").toFile.getAbsolutePath
    TableLog.overwritePartitions(
      assigned.select("vec_id", "embedding", "cluster"), t, "cluster")
    // one directory per non-empty inverted list
    val nLists = assigned.select("cluster").distinct().count()
    assert(TableLog.manifest(t, 1).size == nLists)
    // a 3-query batch at nprobe=2 probes ≤ 6 distinct clusters; the
    // manifest resolves exactly that many dirs — unprobed lists never open
    val q = emb.filter(col("vec_id") < 3)
    val probed = Ann.probeRanks(q, cents).filter(col("pr") <= 2)
      .select("cluster").distinct().collect().map(_.getInt(0).toString).toSet
    assert(probed.size >= 2 && probed.size <= 6)
    assert(TableLog.pruneDirs(t, probed).size == probed.size)
    // search over the pruned subset == search over the full assignment
    val pruned = TableLog.readWhere(spark, t, probed)
    val a = Ann.ivfDetSearch(q, pruned, cents, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    val b = Ann.ivfDetSearch(q, assigned, cents, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    assert(a.sameElements(b),
      "manifest-pruned inverted-list search diverged from the full index")
  }
}
