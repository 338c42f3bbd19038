package graft

import graft.functions.{Bits, Hashing}
import org.scalatest.funsuite.AnyFunSuite

/** Bit-exactness of the pure primitives against goldens computed with a
  * Python re-derivation of reference assistance.py / watermarking.py
  * semantics (values embedded as literals; generator not shipped).
  */
class BitsSpec extends AnyFunSuite {

  test("floatToBin matches reference float_to_bin (assistance.py:1-24)") {
    val golden = Seq(
      (0.0, "0.0"),
      (1.0, "1.0"),
      (123.0, "1111011.0"),
      (0.5, "0.1"),
      (-0.1546943634748459, "0.00100111100110100000110011"),
      (0.01411038264632225, "0.0000001110011100101111001111"),
      (101.37351989746094, "1100101.0101111110011111"),
      (2.7182817459106445, "10.10110111111000010101"),
      (218.0, "11011010.0"),
      (-0.00963662564754486, "0.00000010011101111000101111"),
      (9.999999747378752e-05, "0.0000000000000110100011011011100010111"),
      (3.4028234663852886e+38, "1" * 24 + "0" * 104 + ".0"))
    golden.foreach { case (x, want) => assert(Bits.floatToBin(x) == want, s"for $x") }
  }

  test("binToFloat round-trips floatToBin on float32 values") {
    val rnd = new scala.util.Random(42)
    val cases = Seq(0f, 1f, -1f, 0.5f, 1e-6f, -3.25e4f, 6.1e-5f) ++
      Seq.fill(500)(java.lang.Float.intBitsToFloat(rnd.nextInt())).filter(f => !f.isNaN && !f.isInfinite)
    cases.foreach { f =>
      val b = Bits.floatToBin(f.toDouble)
      assert(Bits.binToFloat(b).toFloat == math.abs(f), s"for $f") // sign is dropped by design
    }
  }

  test("md5Mod matches int(md5(s).hexdigest(),16) % m") {
    val golden = Seq( // (s, %5, %21, %64, %1e9)
      ("000000000", 3L, 2L, 27L, 859186523L),
      ("123456789", 0L, 3L, 11L, 922631435L),
      ("0.15", 0L, 5L, 23L, 856190615L),
      ("abc", 0L, 7L, 50L, 922803570L),
      ("52100000", 2L, 17L, 39L, 526351527L))
    golden.foreach { case (s, m5, m21, m64, m1e9) =>
      assert(Hashing.md5Mod(s, 5) == m5)
      assert(Hashing.md5Mod(s, 21) == m21)
      assert(Hashing.md5Mod(s, 64) == m64)
      assert(Hashing.md5Mod(s, 1000000000L) == m1e9)
    }
  }

  test("unitUniform matches first-52-bit construction") {
    assert(math.abs(Hashing.unitUniform("a#rs#20") - 0.8142201256329487) < 1e-15)
    assert(math.abs(Hashing.unitUniform("42#dim#0") - 0.8290157102738906) < 1e-15)
  }

  test("embedLsb/extractLsb match reference single-vector semantics (watermarking.py:53-117)") {
    val dims = Array(1, 3)
    val golden = Seq(
      (Array(0.5071577429771423f, -0.13978122174739838f, 0.009846050292253494f, 0.1222548857331276f, -0.2366769164800644f, 0.0006196718895807862f, -0.0002671157708391547f, -0.5264173150062561f), "0372140", 5, 0.0006196714239194989f, 1, 0),
      (Array(0.3052974045276642f, 0.18014955520629883f, -0.18762870132923126f, -0.05146447941660881f, 0.15158982574939728f, -0.0784069299697876f, -0.07282472401857376f, -0.4359724521636963f), "0372141", 4, 0.15158982574939728f, 1, 1),
      (Array(0.1663741022348404f, 0.03716427460312843f, 0.08233798295259476f, -0.45795738697052f, 0.4952099323272705f, 0.04630066081881523f, -0.11614198982715607f, 0.6087217330932617f), "0372142", 4, 0.4952099323272705f, 1, 1),
      (Array(-0.013615810312330723f, -0.4352036416530609f, -0.12156836688518524f, -0.6864945292472839f, 0.31481897830963135f, -0.12494229525327682f, -0.22276607155799866f, 0.3217410743236542f), "0372143", 0, 0.013616048730909824f, 1, 0))
    golden.foreach { case (vec, cid, pos, embeddedVal, extAfter, extBefore) =>
      assert(Bits.extractLsb(vec, dims, cid) == extBefore, s"pre-embed bit for $cid")
      val out = Bits.embedLsb(vec, 1, dims, cid)
      assert(out(pos) == embeddedVal, s"embedded value for $cid")
      out.indices.filter(_ != pos).foreach(i => assert(out(i) == vec(i)))
      assert(Bits.extractLsb(out, dims, cid) == extAfter, s"post-embed bit for $cid")
    }
  }

  test("embed is invertible: extract(embed(v, b)) == b") {
    (0 until 300).foreach { seed =>
      val rnd  = new scala.util.Random(seed)
      val vec  = Array.fill(16)((rnd.nextGaussian() * 0.3).toFloat)
      val bit  = seed % 2
      val dims = Hashing.sampleDims(16, 4, seed.toString)
      val cid  = Bits.contentId(vec, dims, 1000.0)
      val out  = Bits.embedLsb(vec, bit, dims, cid)
      assert(Bits.extractLsb(out, dims, cid) == bit, s"seed $seed")
    }
  }

  test("sampleDims returns distinct in-range dims, stable for a seed") {
    val a = Hashing.sampleDims(64, 10, "20")
    assert(a.distinct.length == 10 && a.forall(x => x >= 0 && x < 64))
    assert(a.sameElements(Hashing.sampleDims(64, 10, "20")))
    assert(!a.sameElements(Hashing.sampleDims(64, 10, "21")))
  }

  test("contentId leading-digit semantics") {
    val vec = Array(0.1546943634748459f, -0.2366769164800644f, 0.0006196718895807862f)
    // trunc(|v|*1000) = 154, 236, 0 -> leading digits 1, 2, 0
    assert(Bits.contentId(vec, Array(0, 1, 2), 1000.0) == "120")
    assert(Bits.contentId(vec, Array(2, 0), 1000.0) == "01")
  }
}
