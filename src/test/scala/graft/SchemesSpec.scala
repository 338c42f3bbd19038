package graft

import graft.attacks.Attacks
import graft.watermark.{Scpw, ScpwKey, TabularMark, TmKey, Tvp}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SchemesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb   = Tables.embeddings(spark, TestSpark.sf0001).cache()

  // ---- SCPW ----

  test("SCPW value-hash goldens: micros rendering and hidden bit pinned") {
    import graft.watermark.Scpw
    // the rendering fed to the value hash (oracle mirror:
    // cast(cast(floor(cast(v as double)*1e6 + 0.5) as bigint) as varchar))
    assert(Scpw.microsRender(1.5f) == "1500000")
    assert(Scpw.microsRender(-0.25f) == "-250000")
    assert(Scpw.microsRender(0f) == "0")
    assert(Scpw.microsRender(0.1234567f) == "123457")
    // hand-computed goldens (python hashlib): md5("1234") % 4 = 1,
    // md5("750000") % 2 = 1 → hidden = 1 XOR (1 % 2) = 0
    assert(Scpw.hiddenBit(Array(0f, 0f, 0.75f, 0f), "1234", position = 2) == 0)
  }

  test("SCPW embed then extract recovers the watermark (BER = 0)") {
    val key = ScpwKey(topK = 20, position = 30, stdE = 0.05, seed = "20")
    val wm  = "001010010101001010010"
    val wmDf = Scpw.embed(emb, wm, 0.6, key)
    val got  = Scpw.extract(wmDf, wm.length, key)
      .orderBy("bit_pos").collect().map(_.getInt(1)).mkString
    assert(got == wm)
  }

  test("SCPW noise keeps the carrier column's mean/std approximately") {
    val key = ScpwKey(topK = 20, position = 30, stdE = 0.05, seed = "20")
    val wmDf = Scpw.embed(emb, "10101", 0.6, key)
    val colOf = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(avg(element_at(col("embedding"), 31)), stddev_pop(element_at(col("embedding"), 31)))
        .head
    val o = colOf(emb); val w = colOf(wmDf)
    assert(math.abs(o.getDouble(0) - w.getDouble(0)) < 0.02, "mean drift")
    assert(math.abs(o.getDouble(1) - w.getDouble(1)) < 0.06, "std drift")
  }

  test("SCPW survives mild random deletion") {
    val key = ScpwKey(topK = 20, position = 30, stdE = 0.05, seed = "20")
    val wm  = "10101"
    val wmDf = Scpw.embed(emb, wm, 0.8, key).cache()
    val att  = Attacks.randomDelete(wmDf, 0.1, "7")
    val got  = Scpw.extract(att, wm.length, key)
      .orderBy("bit_pos").collect().map(_.getInt(1)).mkString
    assert(got == wm)
  }

  // ---- TabularMark ----

  test("divideInterval: categories alternate and each sums to p") {
    for (id <- Seq("abc", "12345", "0000040"); p <- Seq(2.5, 4.0, 5.0)) {
      val (c1, c2) = TabularMark.divideInterval(p, id)
      val len = (s: TabularMark.Segments) => s.map(x => x._2 - x._1).sum
      assert(math.abs(len(c1) - p) < 1e-9, s"cat1 length for $id p=$p")
      assert(math.abs(len(c2) - p) < 1e-9, s"cat2 length for $id p=$p")
      // segments tile [-p, p] without overlap
      val all = (c1 ++ c2).sortBy(_._1)
      assert(math.abs(all.head._1 + p) < 1e-9 && math.abs(all.last._2 - p) < 1e-9)
      all.sliding(2).foreach {
        case Vector(a, b) => assert(math.abs(a._2 - b._1) < 1e-9, s"gap in $id")
        case _            =>
      }
      // deterministic
      assert(TabularMark.divideInterval(p, id) == ((c1, c2)))
    }
  }

  test("chooseFromCategory draws land green (findCategory = 0)") {
    val (c1, c2) = TabularMark.divideInterval(4.0, "testid")
    (0 until 50).foreach { i =>
      val x = TabularMark.chooseFromCategory(c1, s"draw$i")
      assert(TabularMark.findCategory(x, c1, c2) == 0, s"draw $x not green")
    }
  }

  test("TabularMark detects its own watermark, not on clean data") {
    val key  = TmKey(nw = 100, p = 4.0, k = 40, position = 50)
    val wmDf = TabularMark.embed(emb, key).cache()
    val det  = TabularMark.detect(emb, wmDf, key).head
    assert(det.getBoolean(4), s"should detect: $det")
    assert(det.getLong(2) > 50, s"ng should be well above nw/2: $det")
    val clean = TabularMark.detect(emb, emb, key).head
    assert(!clean.getBoolean(4), s"false positive on clean data: $clean")
  }

  test("TabularMark match-loss grows under deletion") {
    val key  = TmKey(nw = 100, p = 4.0, k = 40, position = 50)
    val wmDf = TabularMark.embed(emb, key).cache()
    val m0   = TabularMark.matchTuples(emb, wmDf, key).count()
    val att  = Attacks.randomDelete(wmDf, 0.5, "9")
    val m1   = TabularMark.matchTuples(emb, att, key).count()
    assert(m1 < m0, s"matches should drop: $m0 -> $m1")
  }
}
