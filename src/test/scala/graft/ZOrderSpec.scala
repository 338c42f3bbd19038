package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the Morton/Z-order clustering key: bit-exactness against a
  * reference interleave, and the LOCALITY property that justifies the
  * layout — chunking a z-sorted grid keeps per-chunk min/max ranges narrow
  * on BOTH dimensions, where a single-column sort leaves the secondary
  * dimension's per-chunk range at full width (zero pruning power).
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mortonRef(x: Long, y: Long): Long = {
    def spread(v0: Long): Long = {
      var v = v0 & 0xFFFFFFFFL
      v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
      v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v << 2)) & 0x3333333333333333L
      (v | (v << 1)) & 0x5555555555555555L
    }
    spread(x) | (spread(y) << 1)
  }

  test("morton2 matches the reference interleave bit-for-bit") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (12345L, 67890L),
      (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (473568L, 1499L))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton2(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y),
        s"morton2($x, $y) = ${got((x, y))} != ref ${mortonRef(x, y)}")
    }
    // small exhaustive cross-check: round-trip uniqueness over a 64×64 grid
    val zs = for (x <- 0L until 64L; y <- 0L until 64L) yield mortonRef(x, y)
    assert(zs.distinct.size == zs.size, "the interleave collided")
  }

  test("z-sort narrows per-chunk ranges on BOTH dims; a 1-D sort leaves dim 2 at full width") {
    // 128×128 grid, 64 chunks of 256 rows each
    val n = 128
    val rows = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    def chunkWidths(sorted: Seq[(Long, Long)]): (Double, Double) = {
      val chunks = sorted.grouped(256).toSeq
      def avgW(f: ((Long, Long)) => Long) =
        chunks.map(c => (c.map(f).max - c.map(f).min).toDouble).sum / chunks.size
      (avgW(_._1), avgW(_._2))
    }
    val (zx, zy) = chunkWidths(rows.sortBy { case (x, y) => mortonRef(x, y) })
    val (sx, sy) = chunkWidths(rows.sortBy { case (x, y) => (x, y) })
    // z-order: each 256-row chunk is a 16×16 tile → width ~15 on both dims
    assert(zx <= 16 && zy <= 16,
      s"z-chunks must span ~sqrt(chunk) on both dims: x $zx, y $zy")
    // lexicographic sort: x is perfectly clustered but y spans the full grid
    assert(sx <= 2 && sy >= n - 1,
      s"the 1-D sort control broke: x $sx, y $sy")
    // pruning power: a predicate on y skips z-chunks but not lex-chunks
    assert(zy < sy / 4,
      s"z-order must beat the 1-D sort 4x+ on the secondary dim: $zy vs $sy")
  }

  test("hilbert2 reproduces the canonical curve, bijectively") {
    import spark.implicits._
    // the standard order-2 Hilbert walk (n = 4), the textbook sequence —
    // an independent golden reference, not a reimplementation of the loop
    val canonical = Seq(
      (0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L),
      (0L, 2L), (0L, 3L), (1L, 3L), (1L, 2L),
      (2L, 2L), (2L, 3L), (3L, 3L), (3L, 2L),
      (3L, 1L), (2L, 1L), (2L, 0L), (3L, 0L))
    val got = canonical.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.hilbert2(col("x"), col("y"), 2).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    canonical.zipWithIndex.foreach { case (xy, i) =>
      assert(got(xy) == i, s"hilbert2$xy = ${got(xy)}, canonical walk says $i")
    }
    // bijectivity at bits=5: the 32×32 grid maps exactly onto [0, 1024)
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
    val hs = grid.toDF("x", "y")
      .select(ZOrder.hilbert2(col("x"), col("y"), 5).as("h"))
      .collect().map(_.getLong(0))
    assert(hs.sorted.toSeq == (0L until 1024L), "hilbert2 is not a bijection onto [0, 4^bits)")
    // out-of-range coordinates fail loudly (the zBucket contract)
    val e = intercept[Exception] {
      Seq((5L, 1L)).toDF("x", "y")
        .select(ZOrder.hilbert2(col("x"), col("y"), 2)).collect()
    }
    assert(e.toString.contains("zBucket") ||
      Option(e.getCause).exists(_.toString.contains("zBucket")))
  }

  test("hilbert is CONTINUOUS (every step a grid neighbor) — morton is not; seam slices survive fewer hilbert chunks") {
    import spark.implicits._
    val n = 64
    val grid = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    val hOf = grid.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.hilbert2(col("x"), col("y"), 6).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // continuity: consecutive curve indices are Manhattan-distance-1 cells
    val byH = grid.sortBy(hOf)
    val hJumps = byH.sliding(2).count { case Seq(a, b) =>
      math.abs(a._1 - b._1) + math.abs(a._2 - b._2) != 1 }
    assert(hJumps == 0, s"the Hilbert walk teleported $hJumps times — not a Hilbert curve")
    val byM = grid.sortBy { case (x, y) => mortonRef(x, y) }
    val mJumps = byM.sliding(2).count { case Seq(a, b) =>
      math.abs(a._1 - b._1) + math.abs(a._2 - b._2) != 1 }
    assert(mJumps > 0, "control broke: the Z curve is supposed to jump at quadrant seams")

    // THE CLUSTER TABLE — where Hilbert beats Morton and where it doesn't,
    // on the metric that decides real scan cost: how many CONTIGUOUS runs
    // of the curve a query box decomposes into (each run = one contiguous
    // row-span / byte-range to read; Moon, Jagadish, Faloutsos & Saltz,
    // "Analysis of the clustering properties of the Hilbert space-filling
    // curve", TKDE 13(1), 2001, prove Hilbert's run count is strictly
    // better on average). Chunk-survivor counts at power-of-4 chunk sizes
    // CANNOT see the difference — both curves' aligned 4^k runs are exact
    // quadrants with identical min/max boxes — which is exactly why
    // unaligned chunks and range scans are where Morton loses.
    def clusters(key: (Long, Long) => Long, x0: Long, x1: Long, y0: Long, y1: Long): Int = {
      val ks = (for (x <- x0 until x1; y <- y0 until y1) yield key(x, y)).sorted
      1 + ks.sliding(2).count { case Seq(a, b) => b != a + 1 }
    }
    val hKey = (x: Long, y: Long) => hOf((x, y))
    // (a) 200 random small boxes: Hilbert needs ~half Morton's runs and
    // must win (strictly fewer) on at least 95% of them
    val rnd = new scala.util.Random(11)
    val trials = (1 to 200).map { _ =>
      val w = 4 + rnd.nextInt(13); val h = 4 + rnd.nextInt(13)
      val x0 = rnd.nextInt(n.toInt - w).toLong; val y0 = rnd.nextInt(n.toInt - h).toLong
      (clusters(hKey, x0, x0 + w, y0, y0 + h),
        clusters(mortonRef, x0, x0 + w, y0, y0 + h))
    }
    val (hAvg, mAvg) = (trials.map(_._1).sum / 200.0, trials.map(_._2).sum / 200.0)
    val hWins = trials.count(t => t._1 < t._2)
    assert(hAvg < 0.7 * mAvg && hWins >= 190,
      s"Hilbert must dominate the run-count metric: avg $hAvg vs $mAvg, wins $hWins/200")
    // (b) a full-height axis slice — the everyday predicate shape: the
    // continuous curve crosses in/out of the slice far fewer times
    assert(clusters(hKey, 0, 8, 0, n) < clusters(mortonRef, 0, 8, 0, n),
      "Hilbert should cover an axis slice in fewer runs")
    // (c) where it DOESN'T win: a quadrant-ALIGNED box is one contiguous
    // run under BOTH curves (every 4^k-aligned block is a single curve
    // segment for either) — alignment erases the advantage
    assert(clusters(hKey, 0, 16, 0, 16) == 1 && clusters(mortonRef, 0, 16, 0, 16) == 1,
      "aligned quadrants must be single runs under both curves")
  }

  private def morton3Ref(x: Long, y: Long, z: Long): Long = {
    // independent per-bit reference (no magic masks): bit i of each input
    // lands at bit 3i + lane
    def gather(v: Long, lane: Int): Long =
      (0 until 21).foldLeft(0L)((acc, i) =>
        acc | (((v >> i) & 1L) << (3 * i + lane)))
    gather(x, 0) | gather(y, 1) | gather(z, 2)
  }

  test("morton3 matches the per-bit reference interleave bit-for-bit") {
    import spark.implicits._
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (5L, 3L, 7L), (12345L, 678L, 90L),
      (0x1FFFFFL, 0L, 0L), (0L, 0x1FFFFFL, 0L), (0L, 0L, 0x1FFFFFL),
      (0x1FFFFFL, 0x1FFFFFL, 0x1FFFFFL), (473568L, 1499L, 560L))
    val got = cases.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        ZOrder.morton3(col("x"), col("y"), col("z")).as("m"))
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    cases.foreach { case (x, y, z) =>
      assert(got((x, y, z)) == morton3Ref(x, y, z),
        s"morton3($x, $y, $z) = ${got((x, y, z))} != ref ${morton3Ref(x, y, z)}")
    }
    // uniqueness over a 16^3 grid (injective interleave)
    val ms = for (x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L)
      yield morton3Ref(x, y, z)
    assert(ms.distinct.size == ms.size, "the 3-way interleave collided")
    // the full-width code stays non-negative (63 bits)
    assert(morton3Ref(0x1FFFFFL, 0x1FFFFFL, 0x1FFFFFL) > 0L)
  }

  test("z3-sort gives the third dim pruning power the 2-D layout cannot") {
    // 32^3 grid, chunks of 512: the 2-D code ignores z entirely, so
    // z-slices span the full width; the 3-D code trades a little x/y
    // locality for real z locality
    val n = 32
    val rows = for (x <- 0 until n; y <- 0 until n; z <- 0 until n)
      yield (x.toLong, y.toLong, z.toLong)
    def chunkW(sorted: Seq[(Long, Long, Long)], f: ((Long, Long, Long)) => Long): Double = {
      val chunks = sorted.grouped(512).toSeq
      chunks.map(c => (c.map(f).max - c.map(f).min).toDouble).sum / chunks.size
    }
    def m2(r: (Long, Long, Long)) = {
      def spread(v0: Long): Long = {
        var v = v0 & 0xFFFFFFFFL
        v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
        v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
        v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
        v = (v | (v << 2)) & 0x3333333333333333L
        (v | (v << 1)) & 0x5555555555555555L
      }
      spread(r._1) | (spread(r._2) << 1)
    }
    val by2 = rows.sortBy(m2)
    val by3 = rows.sortBy { case (x, y, z) => morton3Ref(x, y, z) }
    val z2 = chunkW(by2, _._3) // 2-D layout: z spans the whole domain
    val z3 = chunkW(by3, _._3)
    val x2 = chunkW(by2, _._1); val x3 = chunkW(by3, _._1)
    assert(z2 >= n - 1, s"control broke: 2-D chunks should span z fully, got $z2")
    // a 512-row chunk of the 3-D curve is an 8x8x8 cube (width 7 on every
    // dim); the 2-D curve packs the same 512 rows as a 4x4 (x,y) tile x the
    // full 32-deep z column (x width 3, z width 31). That IS the trade:
    // z collapses 31 -> 7 while x dilutes 3 -> 7 — bounded by the cube edge
    assert(z3 <= 7.5, s"3-D chunks must be z-local (512 = 8^3 cube): $z3")
    assert(x3 <= 7.5,
      s"x dilution must stay bounded by the 8-cube edge: $x2 -> $x3")
    assert(x3 > x2,
      s"sanity: the third column costs SOME x locality ($x2 -> $x3) — " +
        "if not, the probe stopped measuring the trade")
  }
}
