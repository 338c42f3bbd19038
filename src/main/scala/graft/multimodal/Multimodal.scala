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
  * feature. VIDEO containers are demuxed structurally: a pure-JVM ISO-BMFF
  * box walk (parseMp4Frames) reads the `moov/trak/stbl` sample tables to
  * true per-frame byte extents, timestamps, and keyframe flags — locating
  * frames without decoding pictures (frame sampling needs the former; no
  * codec libraries exist in this toolchain for the latter). Compressed
  * audio and unrecognized bytes fall back to the deterministic
  * byte-histogram / passthrough kernels, clearly marked below; swapping in
  * a real picture decoder changes only those function bodies, nothing about
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

  // ---- Video: structural MP4 / ISO-BMFF demux (pure JVM, no codec) ----

  /** One video sample (frame) located structurally: presentation time,
    * absolute byte offset + length of the coded frame inside the payload,
    * sync-sample (keyframe) flag.
    */
  final case class Mp4Frame(ms: Long, offset: Long, size: Long, key: Boolean)

  /** A demuxed video track: the sample-description codec fourcc from `stsd`
    * (e.g. "jpeg" for MJPEG, "avc1" for H.264; None when the box is absent
    * or malformed — the pre-stsd synthetic fixtures) plus the located
    * frames. A "jpeg" codec means every sample is a self-contained JPEG the
    * JDK's imageio can decode — the one video codec this toolchain can turn
    * into pixel content without an external library.
    */
  final case class Mp4Track(codec: Option[String], frames: Array[Mp4Frame])

  /** ISO-BMFF magic: any box stream starting with an `ftyp` box. */
  def looksLikeMp4(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(4) == 'f' && payload(5) == 't' && payload(6) == 'y' && payload(7) == 'p'

  /** REAL structural video demux, pure JVM (no codec library): walk the
    * ISO-BMFF box tree to the first video track's sample tables —
    * `moov/trak/mdia` with `mdhd` (timescale), `hdlr` (handler must be
    * `vide`), and `minf/stbl`'s `stts` (decode deltas), `stsz` (sample
    * sizes), `stsc` (sample→chunk runs), `stco`/`co64` (chunk offsets),
    * `stss` (sync samples; absent ⇒ every sample is a keyframe, per spec) —
    * and materialize one `Mp4Frame` per sample with its true timestamp and
    * byte extent, plus the `stsd` codec fourcc. This does NOT decode
    * pictures itself; it locates them, which is what frame SAMPLING needs —
    * and when the codec is "jpeg" (MJPEG), `sampleFrames` DOES decode the
    * sampled frames with the imageio path. Returns None on any
    * malformed/truncated/inconsistent structure or when no video track
    * exists — callers fall back to the deterministic stub kernel.
    */
  def parseMp4Frames(payload: Array[Byte]): Option[Array[Mp4Frame]] =
    parseMp4Track(payload).map(_.frames)

  def parseMp4Track(payload: Array[Byte]): Option[Mp4Track] = {
    if (!looksLikeMp4(payload)) return None
    val len = payload.length
    def u32(o: Int): Long =
      ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def typ(o: Int): String =
      new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // children (type, bodyStart, end) of the byte range [start, end)
    def boxes(start: Int, end: Int): Option[List[(String, Int, Int)]] = {
      val out = List.newBuilder[(String, Int, Int)]
      var off = start
      while (off + 8 <= end) {
        val sz = u32(off)
        val t  = typ(off + 4)
        val (body, boxEnd): (Long, Long) =
          if (sz == 1L) { if (off + 16 > end) return None; (off + 16L, off + u64(off + 8)) }
          else if (sz == 0L) (off + 8L, end.toLong) // box extends to end
          else (off + 8L, off + sz)
        if (boxEnd < body || boxEnd > end) return None
        out += ((t, body.toInt, boxEnd.toInt))
        off = boxEnd.toInt
      }
      Some(out.result())
    }
    def child(bs: List[(String, Int, Int)], t: String): Option[(Int, Int)] =
      bs.find(_._1 == t).map(b => (b._2, b._3))

    def videoTrackFrames(trakBody: Int, trakEnd: Int): Option[Mp4Track] = for {
      trakKids <- boxes(trakBody, trakEnd)
      (mdiaB, mdiaE) <- child(trakKids, "mdia")
      mdiaKids <- boxes(mdiaB, mdiaE)
      (mdhdB, mdhdE) <- child(mdiaKids, "mdhd")
      timescale <- {
        if (mdhdE - mdhdB < 4) None
        else {
          val v = payload(mdhdB) & 0xff
          val tsOff = if (v == 1) mdhdB + 4 + 16 else mdhdB + 4 + 8
          if (tsOff + 4 > mdhdE) None
          else Some(u32(tsOff)).filter(_ > 0)
        }
      }
      (hdlrB, hdlrE) <- child(mdiaKids, "hdlr")
      _ <- if (hdlrE - hdlrB >= 12 && typ(hdlrB + 8) == "vide") Some(()) else None
      (minfB, minfE) <- child(mdiaKids, "minf")
      minfKids <- boxes(minfB, minfE)
      (stblB, stblE) <- child(minfKids, "stbl")
      stblKids <- boxes(stblB, stblE)
      // stsd: ver/flags(4) entry_count(4), then the first sample entry —
      // size(4) format(4). The fourcc is all frame decode needs; absent or
      // short boxes leave codec None (structure-only demux, the old
      // behavior).
      codec = child(stblKids, "stsd").collect {
        case (b, e) if e - b >= 16 && u32(b + 4) >= 1 => typ(b + 12)
      }
      frames <- {
        // each table's fixed header (ver/flags + counts) must fit its box
        // BEFORE any u32 read — a header-only box ending at the payload end
        // would otherwise index past the array instead of returning None
        def sized(t: String, minBody: Int): Option[(Int, Int)] =
          child(stblKids, t).filter { case (b, e) => e - b >= minBody }
        for {
          (sttsB, sttsE) <- sized("stts", 8)
          (stszB, stszE) <- sized("stsz", 12)
          (stscB, stscE) <- sized("stsc", 8)
          co <- sized("stco", 8).map((_, false)).orElse(sized("co64", 8).map((_, true)))
          result <- {
            val ((coB, coE), co64) = co
            // stsz: uniform size or per-sample table
            val uniform = u32(stszB + 4)
            val nSamples = u32(stszB + 8).toInt
            // with a uniform size the count is not bounded by the stsz box
            // length — cap it by the payload (≥1 byte per sample) so a
            // corrupted count near 2^31 can't drive gigabyte allocations
            val stszOk = nSamples >= 0 && nSamples <= len &&
              (uniform > 0 || stszB + 12 + 4L * nSamples <= stszE)
            // stts: (count, delta) runs summing to nSamples
            val nStts = u32(sttsB + 4).toInt
            val sttsOk = nStts >= 0 && sttsB + 8 + 8L * nStts <= sttsE
            // stsc runs + chunk offsets
            val nStsc = u32(stscB + 4).toInt
            val stscOk = nStsc >= 1 && stscB + 8 + 12L * nStsc <= stscE
            val nChunks = u32(coB + 4).toInt
            val coOk = nChunks >= 1 && coB + 8 + (if (co64) 8L else 4L) * nChunks <= coE
            if (!stszOk || !sttsOk || !stscOk || !coOk || nSamples == 0) None
            else {
              val sizes = Array.tabulate(nSamples)(k =>
                if (uniform > 0) uniform else u32(stszB + 12 + 4 * k))
              // decode timestamps from the stts runs
              val ts = new Array[Long](nSamples)
              var k = 0; var t = 0L; var run = 0; var ok = true
              while (run < nStts && ok) {
                val cnt = u32(sttsB + 8 + 8 * run).toInt
                val dl  = u32(sttsB + 8 + 8 * run + 4)
                var i = 0
                while (i < cnt && ok) {
                  if (k >= nSamples) ok = false
                  else { ts(k) = t; t += dl; k += 1; i += 1 }
                }
                run += 1
              }
              if (!ok || k != nSamples) None
              else {
                val chunkOff = Array.tabulate(nChunks)(c =>
                  if (co64) u64(coB + 8 + 8 * c) else u32(coB + 8 + 4 * c))
                // keyframes: stss sample numbers (1-based); absent ⇒ all key
                val keys: Option[Set[Int]] = sized("stss", 8).flatMap { case (b, e) =>
                  val n = u32(b + 4).toInt
                  if (n < 0 || b + 8 + 4L * n > e) None
                  else Some((0 until n).map(i => u32(b + 8 + 4 * i).toInt).toSet)
                }
                // expand stsc runs over chunks, laying samples into chunks
                val frames = new Array[Mp4Frame](nSamples)
                var s = 0; var sane = true
                var runI = 0
                while (runI < nStsc && s < nSamples && sane) {
                  val first = u32(stscB + 8 + 12 * runI).toInt
                  val spc   = u32(stscB + 8 + 12 * runI + 4).toInt
                  val next  = if (runI + 1 < nStsc) u32(stscB + 8 + 12 * (runI + 1)).toInt
                              else nChunks + 1
                  if (first < 1 || first > nChunks || spc < 1 || next <= first) sane = false
                  else {
                    var c = first
                    while (c < next && c <= nChunks && s < nSamples && sane) {
                      var off = chunkOff(c - 1)
                      var j = 0
                      while (j < spc && s < nSamples && sane) {
                        val sz = sizes(s)
                        if (off < 0 || off + sz > len) sane = false
                        else {
                          frames(s) = Mp4Frame(ts(s) * 1000L / timescale, off, sz,
                            keys.forall(_.contains(s + 1)))
                          off += sz; s += 1; j += 1
                        }
                      }
                      c += 1
                    }
                  }
                  runI += 1
                }
                if (sane && s == nSamples) Some(frames) else None
              }
            }
          }
        } yield result
      }
    } yield Mp4Track(codec, frames)

    for {
      top <- boxes(0, len)
      (moovB, moovE) <- child(top, "moov")
      moovKids <- boxes(moovB, moovE)
      track <- moovKids.iterator.collect { case ("trak", b, e) => (b, e) }
        .map { case (b, e) => videoTrackFrames(b, e) }
        .collectFirst { case Some(t) => t }
    } yield track
  }

  /** Deterministic minimal-but-valid MP4 for fixtures: `ftyp` + `mdat` +
    * `moov` with one `vide` track whose sample tables derive from assetId —
    * n = 5 + id%7 samples, delta = (2000 + (id%5)·1000) ms at timescale
    * 1000, sizes 16 + (id+k)%9, one chunk at offset 32 (= |ftyp| + mdat
    * header), keyframes every 3rd sample. The closed-form layout is what
    * lets the DuckDB oracle replay the box walk arithmetically while Spark
    * parses the actual bytes.
    */
  def syntheticMp4(assetId: Long): Array[Byte] = {
    val n      = (5 + (assetId % 7)).toInt
    val delta  = 2000 + (assetId % 5) * 1000
    val sizes  = Array.tabulate(n)(k => (16 + ((assetId + k) % 9)).toInt)
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, body: Array[Byte]*): Array[Byte] = {
      val size = 8 + body.map(_.length).sum
      val b = new java.io.ByteArrayOutputStream()
      b.write(be32(size)); b.write(t.getBytes("US-ASCII")); body.foreach(b.write)
      b.toByteArray
    }
    out.write(box("ftyp", "isom".getBytes, be32(0x200), "isom".getBytes, "mp41".getBytes))
    val mdat = Array.tabulate(sizes.sum)(i => ((assetId + i) % 256).toByte)
    out.write(box("mdat", mdat))
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(1000) /* timescale */,
      be32(n * delta), Array[Byte](0x55, (0xc4 - 256).toByte, 0, 0))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes,
      be32(0), be32(0), be32(0), Array[Byte](0))
    val stts = box("stts", be32(0), be32(1), be32(n), be32(delta))
    val stsz = box("stsz", be32(0), be32(0), be32(n),
      sizes.flatMap(s => be32(s)))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(n), be32(1))
    val stco = box("stco", be32(0), be32(1), be32(32))
    val keyNums = (0 until n).filter(_ % 3 == 0).map(_ + 1)
    val stss = box("stss", be32(0) +: be32(keyNums.length) +:
      keyNums.map(k => be32(k)): _*)
    val stbl = box("stbl", stts, stsz, stsc, stco, stss)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", mdia)
    out.write(box("moov", trak))
    out.toByteArray
  }

  /** Solid-gray 16×16 JPEG at compression quality 1.0. At that quality the
    * JDK encoder's quantization steps are all 1 (libjpeg's scaling formula
    * clamps to 1 at q=100), so a constant raster survives encode→decode
    * BIT-EXACTLY for every gray value 0–255 — verified exhaustively by
    * MjpegSpec — which is what lets the DuckDB oracle predict decoded frame
    * content in closed form. Trailing pad bytes after EOI are ignored by
    * the decoder (also spec-gated), so MJPEG samples can be padded to a
    * uniform stsz size.
    */
  // only 256 distinct 16×16 solid-gray JPEGs exist; memoize them so fixture
  // generation (thousands of frames per bench pass) re-encodes each gray
  // once per JVM instead of once per frame
  private val solidJpegCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()

  def encodeSolidJpeg(gray: Int, w: Int = 16, h: Int = 16): Array[Byte] =
    if (w == 16 && h == 16)
      // defensive copy: this is a public API and a caller mutating the
      // returned bytes must not corrupt every later fixture encode of the
      // same gray (the cache holds the only canonical array)
      solidJpegCache.computeIfAbsent(gray & 0xff, g => encodeSolidJpegUncached(g, 16, 16)).clone()
    else encodeSolidJpegUncached(gray, w, h)

  private def encodeSolidJpegUncached(gray: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val v   = gray & 0xff
    val rgb = (v << 16) | (v << 8) | v
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    try writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** MJPEG sample size: every synthetic MJPEG frame is a real JPEG padded
    * with zeros to this uniform size (encoded solid-gray 16×16 measures
    * ≤ ~650 bytes), so stsz is uniform and frame offsets are closed-form
    * (32 + k·1024) for the oracle.
    */
  val MjpegSampleSize = 1024

  /** Synthetic MJPEG fixture gray value for frame k of asset `id` — the
    * closed form the oracle replays (`((id·31 + k·97) mod 256)`).
    */
  def mjpegGray(assetId: Long, k: Int): Int =
    (((assetId * 31 + k * 97) % 256 + 256) % 256).toInt

  /** Deterministic MJPEG-in-MP4 for fixtures: the same moov layout, sample
    * count (5 + id%7), frame cadence ((2000 + (id%5)·1000) ms @ timescale
    * 1000), and keyframe rule (every 3rd) as `syntheticMp4`, but with a
    * `stsd` declaring codec "jpeg", a UNIFORM stsz of `MjpegSampleSize`,
    * and an mdat of REAL zero-padded solid-gray JPEGs (gray = mjpegGray).
    * Spark box-walks and DECODES the actual bytes; the oracle replays the
    * layout and the decoded mean luma arithmetically.
    */
  def syntheticMjpeg(assetId: Long): Array[Byte] = {
    val n     = (5 + (assetId % 7)).toInt
    val delta = 2000 + (assetId % 5) * 1000
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, body: Array[Byte]*): Array[Byte] = {
      val size = 8 + body.map(_.length).sum
      val b = new java.io.ByteArrayOutputStream()
      b.write(be32(size)); b.write(t.getBytes("US-ASCII")); body.foreach(b.write)
      b.toByteArray
    }
    out.write(box("ftyp", "isom".getBytes, be32(0x200), "isom".getBytes, "mp41".getBytes))
    val mdat = new Array[Byte](n * MjpegSampleSize)
    (0 until n).foreach { k =>
      val jpg = encodeSolidJpeg(mjpegGray(assetId, k))
      require(jpg.length <= MjpegSampleSize, s"encoded JPEG ${jpg.length} > pad size")
      System.arraycopy(jpg, 0, mdat, k * MjpegSampleSize, jpg.length)
    }
    out.write(box("mdat", mdat))
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(1000),
      be32(n * delta), Array[Byte](0x55, (0xc4 - 256).toByte, 0, 0))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes,
      be32(0), be32(0), be32(0), Array[Byte](0))
    // stsd: ver/flags, entry_count 1, one visual sample entry whose only
    // load-bearing fields for this demux are its size and "jpeg" fourcc
    // (the 70 zero bytes stand in for the fixed VisualSampleEntry body)
    val stsdEntry = box("jpeg", new Array[Byte](70))
    val stsd = box("stsd", be32(0), be32(1), stsdEntry)
    val stts = box("stts", be32(0), be32(1), be32(n), be32(delta))
    val stsz = box("stsz", be32(0), be32(MjpegSampleSize), be32(n))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(n), be32(1))
    val stco = box("stco", be32(0), be32(1), be32(32))
    val keyNums = (0 until n).filter(_ % 3 == 0).map(_ + 1)
    val stss = box("stss", be32(0) +: be32(keyNums.length) +:
      keyNums.map(k => be32(k)): _*)
    val stbl = box("stbl", stsd, stts, stsz, stsc, stco, stss)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", mdia)
    out.write(box("moov", trak))
    out.toByteArray
  }

  /** Integer mean luma (BT.601, ×1000) of one coded frame's byte range:
    * decode the slice with imageio, fold Σ⌊(299r+587g+114b)/1000⌋, return
    * sum·1000 / pixels — all integer arithmetic, so the oracle's closed
    * form (gray·1000 for a solid-gray frame) matches exactly. −1 when the
    * slice does not decode.
    */
  def frameMeanLumaMilli(payload: Array[Byte], offset: Long, size: Long): Long = {
    if (payload == null || offset < 0 || size <= 0 ||
        offset + size > payload.length) return -1L
    val slice = java.util.Arrays.copyOfRange(
      payload, offset.toInt, (offset + size).toInt)
    // decodeImage catches IOException, but the JDK JPEG reader can also
    // throw RuntimeExceptions on structurally-valid-container +
    // garbage-sample inputs (fuzzed dims, negative allocations) — the same
    // never-throw standard parseMp4Track holds applies here: any failure
    // is the −1 sentinel, never a crashed query
    try decodeImage(slice) match {
      case Some(img) =>
        val (w, h) = (img.getWidth, img.getHeight)
        val pixels = w.toLong * h
        if (pixels <= 0) return -1L
        var sum = 0L; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
            x += 1
          }
          y += 1
        }
        sum * 1000L / pixels
      case None => -1L
    } catch { case _: Throwable => -1L }
  }

  private val mp4TrackUdf = udf((p: Array[Byte]) =>
    parseMp4Track(p).map(t =>
      (t.codec.getOrElse(""), t.frames.map(f => (f.ms, f.offset, f.size, f.key)))))

  private val meanLumaUdf = udf((p: Array[Byte], off: Long, sz: Long) =>
    frameMeanLumaMilli(p, off, sz))

  /** Frame sampling for video assets, now TRI-path:
    *  - payloads that parse as ISO-BMFF get the STRUCTURAL demux
    *    (parseMp4Track): one row per `everyMs` presentation-time bucket —
    *    the earliest sample in the bucket — with the frame's true byte
    *    offset/length and keyframe flag from the sample tables
    *    (`frame_token` is '': the structural fields supersede the stub's
    *    payload excerpt).
    *  - when the track's `stsd` codec is "jpeg" (MJPEG), the SAMPLED frames
    *    are additionally DECODED with the imageio path and report real
    *    pixel content: `mean_luma_milli` (integer BT.601 mean luma ×1000).
    *    The decode runs AFTER the bucket pick and joins the (small) sampled
    *    rows back to the payloads — locate-then-fetch, never decode-all —
    *    so at scale only sampled frames pay decode and the window shuffles
    *    frame-table rows, never payload bytes.
    *  - everything else keeps the deterministic stub (fixed offsets below
    *    meta duration, base64 payload slice as token; offset/size −1,
    *    is_key −1) — compressed codecs (H.264 etc.) would need a decoder
    *    this toolchain doesn't have.
    * Absent fields are SENTINELS (−1 / ''), not NULLs: a nullable bigint
    * round-trips as float64 through pandas reads of the verify dumps
    * ("32.0" ≠ "32"), so NULL-free columns keep all oracle read paths
    * exact. is_key is int (1/0 structural, −1 fallback) for the same
    * reason; mean_luma_milli is −1 for every non-decoded row.
    * The bucket pick is a window over (asset, bucket) — frame tables are
    * per-asset bounded, so partitions stay small at any corpus size.
    */
  def sampleFrames(assets: DataFrame, everyMs: Long): DataFrame = {
    // persisted: the structural and fallback branches each filter this
    // frame, and without the persist the demux UDF (and whatever produced
    // the payload) would re-run once per branch (same pattern as Dedup's
    // shared shingle frame; GraftCache so bench passes release it)
    val vids = graft.GraftCache.track(assets.filter(col("kind") === "video")
      .withColumn("__track", mp4TrackUdf(col("payload"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("asset_id"), col("__bucket"))
      .orderBy(col("frame_ms"), col("frame_offset"))
    val picked = vids.filter(col("__track").isNotNull)
      .select(col("asset_id"), col("__track._1").as("__codec"),
        explode(col("__track._2")).as("f"))
      .select(col("asset_id"), col("__codec"), col("f._1").as("frame_ms"),
        col("f._2").as("frame_offset"), col("f._3").as("frame_size"),
        col("f._4").as("is_key"))
      .withColumn("__bucket", floor(col("frame_ms") / lit(everyMs)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("asset_id"), col("__codec"), col("frame_ms"),
        col("frame_offset"), col("frame_size"),
        col("is_key").cast(IntegerType).as("is_key"))
    // content decode for MJPEG: sampled rows only, joined back to payloads
    val decoded = picked.filter(col("__codec") === "jpeg")
      .join(vids.select(col("asset_id"), col("payload")), "asset_id")
      .withColumn("mean_luma_milli",
        meanLumaUdf(col("payload"), col("frame_offset"), col("frame_size")))
      .drop("payload")
    val structural = decoded
      .unionByName(picked.filter(col("__codec") =!= "jpeg")
        .withColumn("mean_luma_milli", lit(-1L)))
      .select(col("asset_id"), col("frame_ms"), col("frame_offset"),
        col("frame_size"), col("is_key"), lit("").as("frame_token"),
        col("mean_luma_milli"))
    val fallback = vids.filter(col("__track").isNull)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))))
      .select(
        col("asset_id"), col("frame_ms"),
        lit(-1L).as("frame_offset"),
        lit(-1L).as("frame_size"),
        lit(-1).as("is_key"),
        substring(base64(col("payload")), (pmod(col("frame_ms"), lit(32)) + 1).cast("int"), lit(16))
          .as("frame_token"),
        lit(-1L).as("mean_luma_milli"))
    structural.unionByName(fallback)
  }
}
