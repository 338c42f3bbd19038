package graft

import graft.attacks.Attacks
import graft.graph.KnnGraph
import graft.watermark.{Tvp, WmKey}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The engine's central design claim (DESIGN.md §1): every operator is a pure
  * function of its input CONTENT — repartitioning must not change a single
  * bit. These tests run the same operator over differently-partitioned
  * copies of the input and require identical results.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb   = Tables.embeddings(spark, TestSpark.sf0001).cache()
  val key        = WmKey(seed = "20")

  private def collectSorted(df: DataFrame): Array[String] =
    df.orderBy("vec_id").collect().map(_.toString)

  private def variants: Seq[DataFrame] =
    Seq(emb.repartition(3), emb.repartition(13), emb.coalesce(1))

  test("classify is partition-invariant") {
    val ref = collectSorted(Tvp.classify(emb, 64, 5, key))
    variants.foreach { v =>
      assert(collectSorted(Tvp.classify(v, 64, 5, key)).sameElements(ref))
    }
  }

  test("random deletion selects identical rows under any partitioning") {
    val ref = collectSorted(Attacks.randomDelete(emb, 0.3, "42").select("vec_id"))
    variants.foreach { v =>
      assert(collectSorted(Attacks.randomDelete(v, 0.3, "42").select("vec_id")).sameElements(ref))
    }
  }

  test("RS embedding produces bit-identical vectors under any partitioning") {
    val ref = collectSorted(Tvp.embedRs(emb, "10101", 0.6, 64, key))
    variants.foreach { v =>
      assert(collectSorted(Tvp.embedRs(v, "10101", 0.6, 64, key)).sameElements(ref))
    }
  }

  test("accessibility index is bit-identical under any partitioning") {
    def aiOf(df: DataFrame) =
      KnnGraph.accessibility(df, KnnGraph.edges(df, 4))
    val ref = collectSorted(aiOf(emb))
    variants.foreach { v => assert(collectSorted(aiOf(v)).sameElements(ref)) }
  }

  test("SCPW embedding (bounded keyed pool) is bit-identical under any partitioning") {
    import graft.watermark.{Scpw, ScpwKey}
    val sk  = ScpwKey(topK = 20, position = 30, stdE = 0.05, seed = "20")
    val ref = collectSorted(Scpw.embed(emb, "10101", 0.6, sk))
    variants.foreach { v =>
      assert(collectSorted(Scpw.embed(v, "10101", 0.6, sk)).sameElements(ref))
    }
  }

  test("prefix-filtered jaccard join is partition-invariant") {
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    def run(df: DataFrame) = graft.text.Dedup.jaccardPairs(df, 0.4)
      .orderBy("a", "b").collect().map(_.toString)
    val ref = run(docs)
    Seq(docs.repartition(3), docs.repartition(13), docs.coalesce(1)).foreach { v =>
      assert(run(v).sameElements(ref))
    }
  }

  test("insertion attack synthesizes identical rows under any partitioning") {
    val ref = collectSorted(Attacks.insert(emb.select("vec_id", "embedding"), 0.2, 64, "42"))
    variants.foreach { v =>
      assert(collectSorted(Attacks.insert(v.select("vec_id", "embedding"), 0.2, 64, "42")).sameElements(ref))
    }
  }
}
