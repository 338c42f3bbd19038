package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The Spark-side machinery (schema, batch iteration via mapPartitions,
  * partition sizing, output shapes) is real and tested. IMAGE payloads are
  * decoded for real: PNG/JPEG (recognized by magic bytes) go through the
  * JDK's javax.imageio — luminance-histogram features and true raster
  * resize+re-encode — with no external dependency. AUDIO payloads are
  * decoded for real when they are RIFF/WAVE integer PCM: a pure-JVM RIFF
  * chunk walk (decodeWav) yields the samples behind the amplitude-histogram
  * feature. Everything else (video, compressed audio, unrecognized bytes —
  * no codec libraries in this toolchain) falls back to the deterministic
  * byte-histogram / passthrough kernels, clearly marked below; swapping in
  * a real video decoder changes only those function bodies, nothing about
  * the distributed plan.
  */
object Multimodal {

  private val PngMagic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)

  /** PNG or JPEG by magic bytes — the formats javax.imageio ships decoders
    * for in every JDK.
    */
  def looksLikeImage(payload: Array[Byte]): Boolean =
    (payload.length >= 4 && payload.startsWith(PngMagic)) ||
      (payload.length >= 3 && (payload(0) & 0xff) == 0xff &&
        (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff)

  /** Decode an image payload with the JDK codec; None when the bytes are not
    * a decodable PNG/JPEG. In-memory only (no ImageIO disk cache).
    */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(payload)) None
    else
      try {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(in); Option(r.read(0)) }
          finally { r.dispose(); in.close() }
        }
      } catch { case _: java.io.IOException => None }

  /** Decoded PCM audio: native-rate interleaved samples normalized to signed
    * 16-bit regardless of source bit depth.
    */
  final case class PcmAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
                            samples: Array[Short])

  /** RIFF/WAVE magic ("RIFF" …size… "WAVE"). */
  def looksLikeWav(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E'

  /** REAL audio decode, pure JVM (no codec library needed): RIFF chunk walk,
    * PCM (format 1) at 8 or 16 bits. 8-bit WAV samples are unsigned per the
    * spec and are rescaled to signed 16-bit so downstream features see one
    * range. Returns None for any non-WAV / non-PCM / truncated payload —
    * callers fall back to the stub kernel, never crash.
    */
  def decodeWav(payload: Array[Byte]): Option[PcmAudio] = {
    if (!looksLikeWav(payload)) return None
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var data: Option[(Int, Int)]     = None // (offset, length)
    while (off + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // RIFF chunk sizes are UNSIGNED 32-bit: read and bound-check in Long so
      // a crafted size near 2^31 can't overflow the check negative and walk
      // past the payload (huge allocation / out-of-bounds read)
      val size = le32(off + 4).toLong & 0xffffffffL
      if (off + 8 + size > payload.length) return None // truncated
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = le16(off + 8)
          val bits        = le16(off + 8 + 14)
          if (audioFormat != 1 || (bits != 8 && bits != 16)) return None // not integer PCM
          fmt = Some((le16(off + 8 + 2), le32(off + 8 + 4), bits))
        case "data" => data = Some((off + 8, size.toInt)) // ≤ payload.length, fits Int
        case _      => ()
      }
      // word-aligned advance; size already proven ≤ payload.length so the
      // Long sum fits Int (the +1 pad can at most step one past the end,
      // which just ends the loop)
      off = (off + 8 + size + (size & 1L)).toInt
    }
    for ((channels, rate, bits) <- fmt; (dOff, dLen) <- data) yield {
      val samples =
        if (bits == 16) {
          val n   = dLen / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = le16(dOff + 2 * i).toShort; i += 1 }
          out
        } else {
          val out = new Array[Short](dLen)
          var i = 0
          while (i < dLen) { out(i) = (((payload(dOff + i) & 0xff) - 128) << 8).toShort; i += 1 }
          out
        }
      PcmAudio(rate, channels, bits, samples)
    }
  }

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = false)))

  /** Build an asset table from the documents fixture: payload = utf-8 bytes
    * (stand-in blob), kind round-robins the modalities, meta derives
    * deterministically. Real pipelines would read binary files instead
    * (`spark.read.format("binaryFile")`); the downstream ops are identical.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(kinds, (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "utf-8").as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).cast("long").as("n_bytes"),
        (pmod(col("asset_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("asset_id"), lit(48)) + 16).cast("int").as("height"),
        (pmod(col("asset_id"), lit(90000)) + 1000).cast("long").as("duration_ms")))
  }

  /** Metadata extraction — pure column ops (no decode needed). */
  def extractMeta(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("kind"),
      col("meta.n_bytes").as("n_bytes"),
      sha2(col("payload"), 256).as("payload_sha256"),
      col("meta.width").as("width"), col("meta.height").as("height"))

  /** Decode + feature-extract, batched per partition. Decodable PNG/JPEG
    * payloads produce a REAL pixel feature: the normalized luminance
    * histogram over `dim` buckets (integer BT.601 luma, so the buckets are
    * bit-deterministic across JVMs). Decodable WAV/PCM payloads produce a
    * REAL audio feature: the normalized amplitude histogram of the decoded
    * 16-bit samples (integer bucketing — bit-deterministic). Everything
    * else (video, compressed audio — STUB KERNEL, no codec libraries in
    * this toolchain) falls back to the deterministic normalized byte
    * histogram. The mapPartitions shape (one reusable buffer per partition,
    * streaming iterator, fixed-width output schema) is shared by all paths.
    */
  def decodeFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rows = assets.select(col("asset_id"), col("payload")).rdd.mapPartitions { it =>
      val hist = new Array[Float](dim) // reused per-partition buffer
      it.map { r =>
        val id      = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        java.util.Arrays.fill(hist, 0f)
        decodeImage(payload) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                  114 * (rgb & 0xff)) / 1000
                hist(lum * dim / 256) += 1f
                x += 1
              }
              y += 1
            }
            val n = math.max(1, w * h).toFloat
            Row(id, hist.map(_ / n).toSeq)
          case None => decodeWav(payload) match {
            case Some(pcm) => // REAL audio kernel: amplitude histogram
              val s = pcm.samples
              var i = 0
              while (i < s.length) { hist(((s(i) + 32768) * dim) >>> 16) += 1f; i += 1 }
              val n = math.max(1, s.length).toFloat
              Row(id, hist.map(_ / n).toSeq)
            case None => // STUB fallback: normalized byte histogram
              var i = 0
              while (i < payload.length) { hist((payload(i) & 0xff) % dim) += 1f; i += 1 }
              val n = math.max(1, payload.length).toFloat
              Row(id, hist.map(_ / n).toSeq)
          }
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Resize: decodable PNG/JPEG payloads are REALLY transcoded — bilinear
    * raster scale to (w, h), re-encoded as PNG, meta updated with the new
    * byte length. Non-image payloads keep the stub behavior (target size
    * recorded in meta, payload passthrough).
    */
  def resize(assets: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = assets.sparkSession
    val schema = StructType(assetSchema.fields.toSeq)
    val rows = assets.select(col("asset_id"), col("kind"), col("payload"), col("meta"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val meta    = r.getStruct(3)
          decodeImage(payload) match {
            case Some(img) =>
              val scaled = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = scaled.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
              g.dispose()
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(scaled, "png", out)
              val bytes = out.toByteArray
              Row(r.getLong(0), r.getString(1), bytes,
                Row(bytes.length.toLong, w, h, meta.getLong(3)))
            case None =>
              Row(r.getLong(0), r.getString(1), payload,
                Row(meta.getLong(0), w, h, meta.getLong(3)))
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Frame-sample stub for video assets: one row per sampled frame offset,
    * payload sliced deterministically (a real impl would demux).
    */
  def sampleFrames(assets: DataFrame, everyMs: Long): DataFrame =
    assets.filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))))
      .select(
        col("asset_id"), col("frame_ms"),
        substring(base64(col("payload")), (pmod(col("frame_ms"), lit(32)) + 1).cast("int"), lit(16))
          .as("frame_token"))
}
