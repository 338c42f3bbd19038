package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the MJPEG content-decode path. The multimodal_frames oracle
  * predicts decoded pixel content in closed form; that prediction rests on
  * one JVM fact — a solid-gray JPEG encoded at quality 1.0 roundtrips
  * BIT-EXACTLY (all quantization steps clamp to 1, constant blocks have no
  * AC energy) — which test 1 verifies exhaustively for all 256 grays,
  * including the trailing zero-padding MJPEG samples carry. If a JDK swap
  * ever breaks the exactness, this spec fails loudly instead of the driver
  * gate failing mysteriously.
  */
class MjpegSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("solid-gray JPEG roundtrips exactly for all 256 grays, padding ignored") {
    (0 until 256).foreach { v =>
      val jpg = Multimodal.encodeSolidJpeg(v)
      assert(jpg.length <= Multimodal.MjpegSampleSize,
        s"encoded gray $v is ${jpg.length} bytes, exceeds the uniform sample size")
      val padded = java.util.Arrays.copyOf(jpg, jpg.length + 37)
      val img = Multimodal.decodeImage(padded).getOrElse(fail(s"gray $v did not decode"))
      assert(img.getWidth == 16 && img.getHeight == 16)
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          val rgb = img.getRGB(x, y)
          val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          assert(r == v && g == v && b == v, s"gray $v decoded to ($r,$g,$b) at ($x,$y)")
          x += 1
        }
        y += 1
      }
    }
  }

  test("syntheticMjpeg parses to a jpeg-coded track with the closed-form layout") {
    val id = 20L // video id ≡ 0 (mod 4): n = 5 + 20%7 = 11, delta = 2000 ms
    val bytes = Multimodal.syntheticMjpeg(id)
    val track = Multimodal.parseMp4Track(bytes).getOrElse(fail("no track parsed"))
    assert(track.codec.contains("jpeg"))
    val n = (5 + id % 7).toInt
    assert(track.frames.length == n)
    track.frames.zipWithIndex.foreach { case (f, k) =>
      assert(f.ms == k * 2000L)
      assert(f.offset == 32L + k * Multimodal.MjpegSampleSize)
      assert(f.size == Multimodal.MjpegSampleSize)
      assert(f.key == (k % 3 == 0))
      // and the frame's byte range decodes to exactly its generator gray
      assert(Multimodal.frameMeanLumaMilli(bytes, f.offset, f.size) ==
        Multimodal.mjpegGray(id, k) * 1000L, s"frame $k content")
    }
    // the structure-only generator still reports no codec (no stsd box)
    assert(Multimodal.parseMp4Track(Multimodal.syntheticMp4(id))
      .exists(_.codec.isEmpty))
  }

  test("sampleFrames reports decoded content for MJPEG, sentinel elsewhere") {
    import spark.implicits._
    val assets = Seq(
      (8L, "video", Multimodal.syntheticMjpeg(8L), 60000L),
      (10L, "video", Multimodal.syntheticMp4(10L), 60000L),
      (9L, "video", "not a container".getBytes, 25000L))
      .toDF("asset_id", "kind", "payload", "dur")
      .select(col("asset_id"), col("kind"), col("payload"),
        struct(length(col("payload")).cast("long").as("n_bytes"),
          lit(8).as("width"), lit(8).as("height"),
          col("dur").as("duration_ms")).as("meta"))
    val got = Multimodal.sampleFrames(assets, everyMs = 10000)
      .orderBy("asset_id", "frame_ms").collect()
    val mj = got.filter(_.getLong(0) == 8L)
    assert(mj.nonEmpty)
    // id=8: delta = 2000 + 8%5*1000 = 5000 ms → sampled ks are 0, 2, 4, 6, 8
    // (first frame of each 10 s bucket); content = mjpegGray(8, k)·1000
    mj.foreach { r =>
      val k = (r.getLong(1) / 5000L).toInt
      assert(r.getAs[Long]("mean_luma_milli") == Multimodal.mjpegGray(8L, k) * 1000L,
        s"sampled frame at ${r.getLong(1)} ms")
      assert(r.getLong(3) == Multimodal.MjpegSampleSize)
    }
    // structure-only MP4 and the non-BMFF fallback both sentinel content
    assert(got.filter(_.getLong(0) == 10L).nonEmpty)
    got.filterNot(_.getLong(0) == 8L).foreach(r =>
      assert(r.getAs[Long]("mean_luma_milli") == -1L))
  }
}
