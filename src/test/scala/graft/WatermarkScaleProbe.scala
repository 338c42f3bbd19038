package graft
import graft.attacks.Attacks
import graft.watermark.{Tvp, WmKey}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale attribution for the CORE reference pipeline — embed → attack →
  * extract — at a 100× corpus (200k synthetic 64-dim vectors, same keyed-hash
  * generator as ScaleProbe/IvfScaleProbe). Stage-timed: classify, carrier
  * selection, embed, keyed deletion, blind extraction; asserts exact
  * inversion (BER = 0 at p = 0) and prints BER after a 30% deletion.
  * The published curves (RESULTS.md) hold the statistics; this probe holds
  * the SHAPE claim — every stage is a map, a keyed window, or one
  * group-by-L-groups aggregate, so wall time must stay near-linear in N.
  * Run: `sbt "Test/runMain graft.WatermarkScaleProbe [nRows]"`.
  */
object WatermarkScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val d = 64
    val gen = udf((id: Long) => Array.tabulate(d)(j =>
      (graft.functions.Hashing.unitUniform(s"$id/$j").toFloat - 0.5f)))
    val emb = spark.range(n)
      .select(col("id").as("vec_id"), gen(col("id")).as("embedding")).cache()
    emb.count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[wmscale] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val wm  = "001010010101001010010" // the reference's 21-bit watermark
    val key = WmKey(seed = "20")
    val bits = Tvp.bitsDf(spark, wm)
    val cl = time("classify (map-only)") {
      val c = Tvp.classify(emb, d, wm.length, key).localCheckpoint(); c.count(); c
    }
    val carriers = time("carriersRs (keyed ranks)") {
      val c = Tvp.carriersRs(cl, bits, 0.54, key.seed).localCheckpoint(); c.count(); c
    }
    val wmDf = time("applyEmbed (join + flip)") {
      val w = Tvp.applyEmbed(emb, carriers, d, key).localCheckpoint(); w.count(); w
    }
    val ext0 = time("extract clean") {
      Tvp.extract(wmDf, wm.length, d, key).localCheckpoint()
    }
    val ber0 = Tvp.ber(bits, ext0)
    println(f"[wmscale] BER at p=0: $ber0%.4f (must be 0)")
    require(ber0 == 0.0, s"exact inversion failed at N=$n")
    // TVP two-phase selection at scale (synthetic keyed-uniform ai — the
    // real graph build is ScaleProbe's subject; here the SELECTION shape is):
    val aiDf = emb.select(col("vec_id"),
      (conv(substring(md5(concat(lit("ai|"), col("vec_id"))), 1, 13), 16, 10)
        .cast("double") / 4503599627370496.0).as("ai")).localCheckpoint()
    val tvC = time("carriersAi (two-phase)") {
      val c = Tvp.carriersAi(cl, bits, 0.54, 0.5, aiDf).localCheckpoint(); c.count(); c
    }
    val tvBer = Tvp.ber(bits, Tvp.extract(
      Tvp.applyEmbed(emb, tvC, d, key), wm.length, d, key))
    println(f"[wmscale] TVP BER at p=0: $tvBer%.4f (must be 0)")
    require(tvBer == 0.0, s"TVP exact inversion failed at N=$n")
    val attacked = time("randomDelete p=0.3") {
      val a = Attacks.randomDelete(wmDf, 0.3, "42").localCheckpoint(); a.count(); a
    }
    val ber = time("extract after delete") {
      Tvp.ber(bits, Tvp.extract(attacked, wm.length, d, key))
    }
    // 21 groups of ~9.5k rows, ~380-row margins: deletion at p=0.3 is ~19σ
    // from flipping any vote — the N=10k published plateau, and then some
    println(f"[wmscale] BER after 30%% deletion: $ber%.4f (margin ≈ 0.08·n/21 ≈ ${0.08 * n / 21}%.0f rows)")
    require(ber == 0.0, s"a ~${0.08 * n / 21}%.0f-row margin flipped under p=0.3 deletion")
    spark.stop()
  }
}
