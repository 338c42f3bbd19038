package graft

import graft.watermark.{Tvp, WmKey}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TvpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb   = Tables.embeddings(spark, TestSpark.sf0001).cache()
  val key        = WmKey(seed = "20")
  val d          = 64

  test("classify: groups cover [0,L), bits in {0,1}, deterministic") {
    val l  = 5
    val cl = Tvp.classify(emb, d, l, key).cache()
    assert(cl.count() == emb.count())
    val groups = cl.select("group_id").distinct().collect().map(_.getInt(0)).sorted
    assert(groups.forall(g => g >= 0 && g < l))
    assert(cl.filter(col("hidden_bit").isin(0, 1)).count() == cl.count())
    // deterministic across evaluations
    val a = cl.orderBy("vec_id").collect()
    val b = Tvp.classify(emb, d, l, key).orderBy("vec_id").collect()
    assert(a.sameElements(b))
  }

  test("RS embed then extract recovers the watermark exactly (BER = 0)") {
    for (wm <- Seq("10101", "001010010101001010010")) {
      val wmDf = Tvp.embedRs(emb, wm, 0.6, d, key)
      val ext  = Tvp.extract(wmDf, wm.length, d, key)
      val got  = ext.orderBy("bit_pos").collect().map(_.getInt(1)).mkString
      assert(got == wm, s"extracted $got != $wm")
      assert(Tvp.ber(Tvp.bitsDf(spark, wm), ext) == 0.0)
    }
  }

  test("embed only touches carriers; carrier count equals the deficit plan") {
    val wm         = "10101"
    val classified = Tvp.classify(emb, d, wm.length, key).cache()
    val bits       = Tvp.bitsDf(spark, wm)
    val needs      = Tvp.groupNeeds(classified, bits, 0.6)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val carriers = Tvp.carriersRs(classified, bits, 0.6, key.seed).cache()
    val byGroup  = carriers.groupBy("group_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    needs.foreach { case (g, need) => assert(byGroup.getOrElse(g, 0L) == need, s"group $g") }

    val wmDf = Tvp.applyEmbed(emb, carriers, d, key)
    val changed = wmDf.as("w").join(emb.as("o"), "vec_id")
      .filter(col("w.embedding") =!= col("o.embedding"))
      .select("vec_id")
    // every changed row is a carrier (a carrier may be a no-op if the bit already matched the target write)
    assert(changed.join(carriers, Seq("vec_id"), "left_anti").count() == 0)
  }

  test("majority vote holds its bit after removing a minority of rows") {
    val wm   = "10101"
    val wmDf = Tvp.embedRs(emb, wm, 0.8, d, key)
    // drop 10% of rows by keyed hash (stand-in for random deletion)
    val kept = wmDf.filter(pmod(xxhash64(col("vec_id"), lit("del")), lit(10)) =!= 0)
    val ext  = Tvp.extract(kept, wm.length, d, key)
    val got  = ext.orderBy("bit_pos").collect().map(_.getInt(1)).mkString
    assert(got == wm, s"after 10% deletion: $got != $wm")
  }

  test("carriersRsSwept matches carriersRs cell-for-cell") {
    val wm   = "10101"
    val bits = Tvp.bitsDf(spark, wm)
    val cl   = Tvp.classify(emb, d, wm.length, key)
    val sts   = Seq(0.6, 0.8, 1.0)
    val seeds = Seq(0 -> "20-r0", 1 -> "20-r1")
    val swept = Tvp.carriersRsSwept(cl, bits, sts, seeds).cache()
    for (st <- sts; (rep, seed) <- seeds) {
      val cell   = swept.filter(col("st") === st && col("rep") === rep)
        .select("vec_id", "group_id", "wm_bit")
      val single = Tvp.carriersRs(cl, bits, st, seed)
        .select("vec_id", "group_id", "wm_bit")
      assert(cell.exceptAll(single).count() == 0 && single.exceptAll(cell).count() == 0,
        s"cell (st=$st, seed=$seed) differs from carriersRs")
    }
  }
}
