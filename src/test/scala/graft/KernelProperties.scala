package graft

import graft.functions.{Bits, Hashing}
import graft.watermark.{Scpw, TabularMark}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties over the pure kernels (the SURVEY §5 plan): codec
  * round-trips, LSB embed→extract identity, interval-bipartition tiling,
  * category-draw membership, and keyed-hash range/determinism contracts.
  * No Spark session — these pin the reference-semantics functions
  * themselves, complementing the golden tests.
  */
object KernelProperties extends Properties("graft.kernels") {

  // fixture-magnitude float32s: |v| < 1000 keeps intlen + fraclen within the
  // 24-bit significand window, where the LSB flip is float32-exact (larger
  // magnitudes lose low integer bits to rounding — inherent to the
  // reference scheme, which operates on SIFT values <= 218)
  private val smallFloat: Gen[Float] = Gen.choose(-1000.0f, 1000.0f)
  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](16, smallFloat)
  private val seedGen: Gen[String] = Gen.alphaNumStr.map(_.take(12))

  property("floatToBin/binToFloat round-trips float32 magnitudes") =
    forAll(smallFloat) { v =>
      val x = math.abs(v.toDouble) // codec drops sign (assistance.py quirk)
      Bits.binToFloat(Bits.floatToBin(x)) == x
    }

  property("extractLsb inverts embedLsb for every bit/cid/vector") =
    forAll(vecGen, Gen.oneOf(0, 1), seedGen) { (vec, bit, cid0) =>
      val cid  = s"c$cid0"
      val dims = Hashing.sampleDims(16, 4, cid)
      Bits.extractLsb(Bits.embedLsb(vec, bit, dims, cid), dims, cid) == bit
    }

  property("interval bipartition: both categories total exactly p and tile [-p, p]") =
    forAll(Gen.choose(1.5, 10.0), seedGen) { (p, seed) =>
      val (c1, c2) = TabularMark.divideInterval(p, seed)
      def len(c: TabularMark.Segments) = c.map { case (s, e) => e - s }.sum
      val all = (c1 ++ c2).sortBy(_._1)
      val tiles = all.head._1 == -p && math.abs(all.last._2 - p) < 1e-9 &&
        all.sliding(2).forall {
          case Seq((_, e1), (s2, _)) => math.abs(e1 - s2) < 1e-9
          case _                     => true
        }
      Prop(math.abs(len(c1) - p) < 1e-9) :| s"cat1 len ${len(c1)}" &&
        Prop(math.abs(len(c2) - p) < 1e-9) :| s"cat2 len ${len(c2)}" &&
        Prop(tiles) :| "segments do not tile [-p, p]"
    }

  property("category draws land inside their own category") =
    forAll(Gen.choose(1.5, 10.0), seedGen, seedGen) { (p, seed, drawKey) =>
      val (c1, c2) = TabularMark.divideInterval(p, seed)
      val x = TabularMark.chooseFromCategory(c1, drawKey)
      TabularMark.findCategory(x, c1, c2) == 0
    }

  property("sampleDims: n distinct dims within [0, d)") =
    forAll(Gen.choose(4, 64), seedGen) { (d, seed) =>
      val n  = math.min(10, d)
      val ds = Hashing.sampleDims(d, n, seed)
      ds.length == n && ds.distinct.length == n && ds.forall(x => x >= 0 && x < d)
    }

  property("unitUniform in [0,1); md5Mod in [0,m); both deterministic") =
    forAll(seedGen, Gen.choose(1L, 1000000L)) { (s, m) =>
      val u = Hashing.unitUniform(s)
      val h = Hashing.md5Mod(s, m)
      u >= 0.0 && u < 1.0 && u == Hashing.unitUniform(s) &&
        h >= 0 && h < m && h == Hashing.md5Mod(s, m)
    }

  property("SCPW hidden bit is binary and value-local (only v[pos] matters)") =
    forAll(vecGen, seedGen) { (vec, cid0) =>
      val cid = s"c$cid0"
      val b   = Scpw.hiddenBit(vec, cid, position = 3)
      val other = vec.clone()
      other(0) = other(0) + 1.0f // perturb a non-position dim
      (b == 0 || b == 1) && Scpw.hiddenBit(other, cid, position = 3) == b
    }
}
