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
}
