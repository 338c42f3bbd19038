package graft.watermark

import graft.{Tables, TestSpark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct parity gate for Tvp.groupedRank — the bucket-distributed rank the
  * carrier selections ride (r9). The oracle queries gate it end-to-end; this
  * spec gates the helper in isolation on adversarial shapes: score TIES
  * (bucket-boundary ties included), skewed group sizes, a one-row group, and
  * the degenerate single-bucket case.
  */
class GroupedRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def referenceRank(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("ref_rn", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))))

  test("groupedRank is row-identical to the partitioned window under ties and skew") {
    import spark.implicits._
    // scores quantized to 8 levels → heavy ties, including across bucket
    // boundaries; group 0 holds ~90% of rows (skew), group 3 exactly 1 row
    val rows = (0 until 4000).map { i =>
      val g = if (i % 10 != 0) 0 else 1 + (i / 10) % 2
      (g, i.toLong, (graft.functions.Hashing.md5Mod(s"s|$i", 8L) * 0.125))
    } :+ ((3, 999999L, 0.5))
    val df = rows.toDF("g", "id", "score")
    val mn = 0.0; val mx = 0.875
    val bucket = least(greatest(
      floor((lit(mx) - col("score")) / (mx - mn) * 65535).cast("int"), lit(0)), lit(65535))
    val got = Tvp.groupedRank(df, Seq("g"), bucket,
      Seq(col("score").desc, col("id")), "rn")
    val joined = referenceRank(df).join(got, Seq("g", "id"))
    assert(joined.filter(col("rn") =!= col("ref_rn")).count() == 0)
    assert(got.count() == rows.length.toLong)
  }

  test("groupedRank degenerate single bucket equals the plain window") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i % 3, i.toLong, (i * 37 % 11).toDouble))
      .toDF("g", "id", "score")
    val got = Tvp.groupedRank(df, Seq("g"), lit(0),
      Seq(col("score").desc, col("id")), "rn")
    val joined = referenceRank(df).join(got, Seq("g", "id"))
    assert(joined.filter(col("rn") =!= col("ref_rn")).count() == 0)
  }

  test("small regime (distributed=false) matches the bucketed rank row-for-row") {
    import spark.implicits._
    val rows = (0 until 2000).map { i =>
      (i % 5, i.toLong, (graft.functions.Hashing.md5Mod(s"t|$i", 8L) * 0.125))
    }
    val df = rows.toDF("g", "id", "score")
    val bucket = least(greatest(
      floor((lit(0.875) - col("score")) / 0.875 * 65535).cast("int"), lit(0)), lit(65535))
    val big = Tvp.groupedRank(df, Seq("g"), bucket,
      Seq(col("score").desc, col("id")), "rn", distributed = true)
      .select(col("g"), col("id"), col("rn"))
    val small = Tvp.groupedRank(df, Seq("g"), bucket,
      Seq(col("score").desc, col("id")), "rn", distributed = false)
      .select(col("g"), col("id"), col("rn").as("rn_s"))
    assert(small.schema("rn_s").dataType == org.apache.spark.sql.types.LongType)
    val joined = big.join(small, Seq("g", "id"))
    assert(joined.filter(col("rn") =!= col("rn_s")).count() == 0)
  }

  test("carrier selection is regime-invariant: forced-big equals default-small") {
    import spark.implicits._
    val key = WmKey()
    val d = 16
    val emb = (0L until 600L).map { i =>
      (i, Array.tabulate(d)(j => (graft.functions.Hashing.md5Mod(s"e|$i|$j", 997L) / 499.0 - 1.0).toFloat))
    }.toDF("vec_id", "embedding")
    val cl = Tvp.classify(emb, d, 5, key)
    val bits = Tvp.bitsDf(spark, "10101")
    def rsSet() = Tvp.carriersRs(cl, bits, 0.6, key.seed)
      .collect().map(_.getLong(0)).toSet
    val smallSel = rsSet()
    spark.conf.set("graft.rank.smallMaxRows", "0")
    try {
      val bigSel = rsSet()
      assert(bigSel == smallSel && smallSel.nonEmpty)
    } finally spark.conf.unset("graft.rank.smallMaxRows")
  }
}
