package graft

import graft.ann.Ann
import graft.events.EventOps
import graft.multimodal.Multimodal
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnMultimodalStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb   = Tables.embeddings(spark, TestSpark.sf0001).cache()

  test("IVF search reaches high recall vs brute-force cosine") {
    val queries = emb.filter(col("vec_id") < 50)
    val exact   = Ann.bruteCosine(queries, emb, 10).cache()
    val (centroids, assigned) = Ann.ivfIndex(emb, nlist = 16)
    // gaussian fixture data has no cluster structure — recall is bounded by
    // probe fraction + centroid correlation; assert usefulness + monotonicity
    val r4 = Ann.recallAtK(Ann.ivfSearch(queries, assigned.cache(), centroids, k = 10, nprobe = 4), exact, 10)
    assert(r4 > 0.4, s"recall@10 nprobe=4 = $r4 (>> 4/16 chance level)")
    val r8 = Ann.recallAtK(Ann.ivfSearch(queries, assigned, centroids, k = 10, nprobe = 8), exact, 10)
    assert(r8 > r4, s"recall must grow with nprobe: $r4 -> $r8")
    // full probe == exact
    val full = Ann.ivfSearch(queries, assigned, centroids, k = 10, nprobe = 16)
    assert(Ann.recallAtK(full, exact, 10) == 1.0)
  }

  test("IVF index round-trips through parquet persistence") {
    val emb  = Tables.embeddings(spark, TestSpark.sf0001)
    val cents = Ann.ivfDetCentroids(emb, nlist = 8)
    val assigned = Ann.ivfDetAssign(emb, cents)
    val queries  = emb.filter(col("vec_id") < 20)
    val fresh = Ann.ivfDetSearch(queries, assigned, cents, k = 5, nprobe = 3)
      .orderBy("query_id", "rank").collect()
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toFile
    try {
      Ann.ivfWrite(dir.getAbsolutePath, cents, assigned)
      val (rc, ra) = Ann.ivfRead(spark, dir.getAbsolutePath)
      assert(rc.length == cents.length && rc.zip(cents).forall { case (a, b) => a.sameElements(b) })
      val replayed = Ann.ivfDetSearch(queries, ra, rc, k = 5, nprobe = 3)
        .orderBy("query_id", "rank").collect()
      assert(replayed.length == fresh.length)
      replayed.zip(fresh).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir).deleteRecursively()
    }
  }

  test("IVF nlist/nprobe surface: nested centroid prefixes, monotone recall, full probe = exact") {
    import graft.knn.Knn
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Ann.bruteCosine(queries, emb, 10, kernel = "fold").cache()
    // centroid sets are md5-prefix-nested across nlist (the property
    // ann_ivf_nlist_sweep's one-CTE oracle replay rests on)
    val c16 = Ann.ivfDetCentroids(emb, nlist = 16)
    val c4  = Ann.ivfDetCentroids(emb, nlist = 4)
    assert(c4.zip(c16.take(4)).forall { case (a, b) => a.sameElements(b) },
      "nlist=4 centroids must be the first 4 of the nlist=16 sample")
    // recall@10 is monotone in nprobe at fixed nlist, and a full probe of
    // every list is the exact result (the grouped kernel scans the whole
    // corpus partitioned by cluster — nothing is pruned)
    val assigned = Ann.ivfDetAssign(emb, c16).cache()
    val recalls = Seq(2, 8, 16).map { np =>
      Ann.recallAtK(Ann.ivfDetSearch(queries, assigned, c16, 10, np), exact, 10)
    }
    assert(recalls.sliding(2).forall { case Seq(a, b) => b >= a },
      s"recall not monotone in nprobe: $recalls")
    assert(recalls.last == 1.0, s"full probe must equal exact, got ${recalls.last}")
    // a probed cluster with no corpus members contributes nothing (the
    // grouped kernel's absent-group convention) instead of throwing
    val gone = assigned.filter(col("cluster") =!= 3)
    val res = Ann.ivfDetSearch(queries, gone, c16, 10, 16)
    assert(res.count() > 0)
    assert(res.filter(col("neighbor_id").isin(
      assigned.filter(col("cluster") === 3).select("vec_id")
        .collect().map(_.getLong(0)).toSeq: _*)).count() == 0,
      "members of the removed list must be unreachable")
  }

  test("IVF beyond-broadcast cogrouped regime is bit-identical to the kernel path") {
    val queries = emb.filter(col("vec_id") < 30)
    val cents = Ann.ivfDetCentroids(emb, nlist = 8)
    val assigned = Ann.ivfDetAssign(emb, cents).cache()
    val kernel = Ann.ivfDetSearch(queries, assigned, cents, k = 7, nprobe = 3)
      .orderBy("query_id", "rank").collect()
    spark.conf.set("graft.ann.broadcastMaxRows", "0")
    try {
      val joined = Ann.ivfDetSearch(queries, assigned, cents, k = 7, nprobe = 3)
        .orderBy("query_id", "rank").collect()
      assert(joined.length == kernel.length && kernel.nonEmpty)
      joined.zip(kernel).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    } finally spark.conf.unset("graft.ann.broadcastMaxRows")
  }

  test("mp4 box walk: synthetic file parses to the exact generated sample table") {
    val id = 46L // n = 5 + 46%7 = 8 samples, delta = 2000 + 46%5*1000 = 3000 ms
    val bytes = Multimodal.syntheticMp4(id)
    assert(Multimodal.looksLikeMp4(bytes))
    val frames = Multimodal.parseMp4Frames(bytes).getOrElse(fail("no frames parsed"))
    val n = (5 + id % 7).toInt
    val delta = 2000 + (id % 5) * 1000
    val sizes = Array.tabulate(n)(k => 16L + (id + k) % 9)
    assert(frames.length == n)
    frames.zipWithIndex.foreach { case (f, k) =>
      assert(f.ms == k * delta, s"ts of sample $k")
      assert(f.size == sizes(k), s"size of sample $k")
      assert(f.offset == 32L + sizes.take(k).sum, s"offset of sample $k")
      assert(f.key == (k % 3 == 0), s"keyflag of sample $k")
      // the frame extent lies inside the payload — a decoder could slice it
      assert(f.offset + f.size <= bytes.length)
    }
  }

  test("mp4 box walk: malformed and non-BMFF payloads fall back, never throw") {
    val good = Multimodal.syntheticMp4(10L)
    assert(Multimodal.parseMp4Frames("not a video".getBytes).isEmpty)
    assert(Multimodal.parseMp4Frames(good.take(40).toArray).isEmpty) // truncated mid-box
    // corrupt the moov size field to overflow the payload
    val corrupt = good.clone()
    val moovOff = {
      def u32(o: Int) = ((corrupt(o) & 0xff) << 24) | ((corrupt(o + 1) & 0xff) << 16) |
        ((corrupt(o + 2) & 0xff) << 8) | (corrupt(o + 3) & 0xff)
      Iterator.iterate(0)(o => o + u32(o)).find(o =>
        new String(corrupt, o + 4, 4) == "moov").get
    }
    corrupt(moovOff) = 0x7f.toByte // size ≈ 2^31: past the payload end
    assert(Multimodal.parseMp4Frames(corrupt).isEmpty)
    // an audio-handler track is not a video track
    val audioOnly = good.clone()
    val videIdx = {
      val pat = "vide".getBytes
      (0 until audioOnly.length - 4).find(i => pat.indices.forall(j => audioOnly(i + j) == pat(j))).get
    }
    "soun".getBytes.zipWithIndex.foreach { case (b, j) => audioOnly(videIdx + j) = b }
    assert(Multimodal.parseMp4Frames(audioOnly).isEmpty)
  }

  test("mp4 box walk: deterministic byte fuzzing never throws or over-allocates") {
    val base = Multimodal.syntheticMp4(8L)
    val rnd = new scala.util.Random(42) // deterministic
    (0 until 1000).foreach { _ =>
      val b = base.clone()
      (0 to rnd.nextInt(8)).foreach(_ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte)
      Multimodal.parseMp4Frames(b) // Some or None — must not throw / hang / OOM
    }
    (0 until base.length by 3).foreach(l => Multimodal.parseMp4Frames(base.take(l).toArray))
    // a uniform-stsz count near 2^31 must be rejected, not allocated
    val huge = base.clone()
    val stszOff = {
      val pat = "stsz".getBytes
      (0 until huge.length - 4).find(i => pat.indices.forall(j => huge(i + j) == pat(j))).get
    }
    // body: ver/flags(4) sample_size(4) count(4) — set uniform=20, count=2^30
    val body = stszOff + 4
    Seq(0, 0, 0, 20).zipWithIndex.foreach { case (v, j) => huge(body + 4 + j) = v.toByte }
    huge(body + 8) = 0x40.toByte; huge(body + 9) = 0; huge(body + 10) = 0; huge(body + 11) = 0
    assert(Multimodal.parseMp4Frames(huge).isEmpty)
  }

  test("mp4 box walk: a header-only table box at the payload end returns None, not AIOOBE") {
    // regression: table count fields were read before checking the box body
    // could hold them — a size-8 stco as the LAST box indexed past the array
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, body: Array[Byte]*): Array[Byte] = {
      val size = 8 + body.map(_.length).sum
      be32(size) ++ t.getBytes("US-ASCII") ++ body.flatten
    }
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200), "isom".getBytes, "mp41".getBytes)
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(1000), be32(100),
      Array[Byte](0x55, (0xc4 - 256).toByte, 0, 0))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes, be32(0), be32(0), be32(0), Array[Byte](0))
    val stts = box("stts", be32(0), be32(1), be32(1), be32(100))
    val stsz = box("stsz", be32(0), be32(10), be32(1))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1))
    val emptyStco = box("stco") // 8 bytes: header only, no ver/flags/count
    val stbl = box("stbl", stts, stsz, stsc, emptyStco)
    val bytes = ftyp ++ box("moov", box("trak", box("mdia", mdhd, hdlr, box("minf", stbl))))
    assert(Multimodal.parseMp4Frames(bytes).isEmpty) // must not throw
  }

  test("mp4 box walk: 64-bit largesize boxes and co64 offsets parse") {
    // hand-build a variant of the synthetic layout using a largesize mdat
    // and a co64 chunk-offset table — the 64-bit paths the generator's
    // compact form never exercises
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def box(t: String, body: Array[Byte]*): Array[Byte] = {
      val size = 8 + body.map(_.length).sum
      be32(size) ++ t.getBytes("US-ASCII") ++ body.flatten
    }
    def largeBox(t: String, body: Array[Byte]*): Array[Byte] = {
      val size = 16 + body.map(_.length).sum
      be32(1) ++ t.getBytes("US-ASCII") ++ be64(size) ++ body.flatten
    }
    val n = 3; val delta = 500; val sizes = Seq(10, 11, 12)
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200), "isom".getBytes, "mp41".getBytes)
    val mdatData = Array.tabulate(sizes.sum)(i => (i % 256).toByte)
    val mdat = largeBox("mdat", mdatData)
    val dataStart = ftyp.length + 16L // largesize header is 16 bytes
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(1000), be32(n * delta),
      Array[Byte](0x55, (0xc4 - 256).toByte, 0, 0))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes, be32(0), be32(0), be32(0), Array[Byte](0))
    val stts = box("stts", be32(0), be32(1), be32(n), be32(delta))
    val stsz = box("stsz", be32(0), be32(0), be32(n), sizes.toArray.flatMap(s => be32(s)))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(n), be32(1))
    val co64 = box("co64", be32(0), be32(1), be64(dataStart))
    val stbl = box("stbl", stts, stsz, stsc, co64)
    val bytes = ftyp ++ mdat ++
      box("moov", box("trak", box("mdia", mdhd, hdlr, box("minf", stbl))))
    val frames = Multimodal.parseMp4Frames(bytes).getOrElse(fail("64-bit variant did not parse"))
    assert(frames.length == n)
    assert(frames.map(_.ms).toSeq == Seq(0L, 500L, 1000L))
    assert(frames.map(_.offset).toSeq == Seq(dataStart, dataStart + 10, dataStart + 21))
    assert(frames.map(_.size).toSeq == Seq(10L, 11L, 12L))
    assert(frames.forall(_.key)) // no stss ⇒ every sample is a sync sample
  }

  test("sampleFrames: structural path for BMFF payloads, stub path for the rest") {
    import spark.implicits._
    val mp4 = Multimodal.syntheticMp4(4L) // n=9, delta=6000ms → 54s of frames
    val assets = Seq(
      (4L, "video", mp4, (54000L, 100L)),
      (5L, "video", "just some text bytes".getBytes, (25000L, 100L)),
      (6L, "audio", mp4, (54000L, 100L))).toDF("asset_id", "kind", "payload", "m")
      .select(col("asset_id"), col("kind"), col("payload"),
        struct(length(col("payload")).cast("long").as("n_bytes"),
          lit(8).as("width"), lit(8).as("height"),
          col("m._1").as("duration_ms")).as("meta"))
    val got = Multimodal.sampleFrames(assets, everyMs = 10000)
      .orderBy("asset_id", "frame_ms").collect()
    val (structural, fallback) = got.partition(_.getLong(0) == 4L)
    // delta=6000, frames at 0..48000: buckets 0..4 → earliest per bucket
    assert(structural.map(_.getLong(1)).toSeq == Seq(0L, 12000L, 24000L, 30000L, 42000L))
    assert(structural.forall(r => r.getLong(2) >= 32L && r.getLong(3) > 0L &&
      r.getInt(4) >= 0 && r.getString(5).isEmpty))
    // keyframes are k%3==0 ⇒ k∈{0,3,6}; the sampled ks are 0,2,4,5,7 ⇒ only k=0
    assert(structural.map(r => r.getInt(4)).toSeq == Seq(1, 0, 0, 0, 0))
    // audio asset contributes nothing; text video takes the stub rows
    assert(fallback.forall(_.getLong(0) == 5L))
    assert(fallback.map(_.getLong(1)).toSeq == Seq(0L, 10000L, 20000L))
    assert(fallback.forall(r => r.getLong(2) == -1L && r.getLong(3) == -1L &&
      r.getInt(4) == -1 && r.getString(5).nonEmpty))
  }

  test("multimodal: meta extraction and stub decode shapes") {
    val docs   = Tables.documents(spark, TestSpark.sf0001)
    val assets = Multimodal.assetsFromDocuments(docs).cache()
    assert(assets.schema("payload").dataType.typeName == "binary")
    val meta = Multimodal.extractMeta(assets)
    assert(meta.filter(length(col("payload_sha256")) =!= 64).count() == 0)
    val feats = Multimodal.decodeFeatures(assets, dim = 16).cache()
    assert(feats.count() == docs.count())
    // deterministic fake decode, unit-normalized histogram
    val f = feats.filter(col("asset_id") === 0).head.getSeq[Float](1)
    assert(f.length == 16 && math.abs(f.sum - 1.0) < 1e-4)
    val frames = Multimodal.sampleFrames(assets, everyMs = 10000)
    assert(frames.count() > 0)
    assert(frames.filter(col("frame_ms") % 10000 =!= 0).count() == 0)
  }

  test("multimodal: a real embedded PNG decodes through the image kernel") {
    import spark.implicits._
    // 4x2 PNG: left half black (lum 0 → bucket 0), right half white
    // (lum 255 → bucket 15)
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val png = out.toByteArray
    assert(Multimodal.looksLikeImage(png))
    assert(!Multimodal.looksLikeImage("plain text".getBytes("UTF-8")))

    val assets = Seq((7L, "image", png)).toDF("asset_id", "kind", "payload")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        length(col("payload")).cast("long").as("n_bytes"),
        lit(4).as("width"), lit(2).as("height"), lit(0L).as("duration_ms")))
    val f = Multimodal.decodeFeatures(assets, dim = 16).head.getSeq[Float](1)
    assert(f(0) == 0.5f && f(15) == 0.5f && f.sum == 1.0f,
      s"luminance histogram wrong: $f")
    // and it differs from the byte-histogram fallback of the same bytes
    val hist = new Array[Float](16)
    png.foreach(b => hist((b & 0xff) % 16) += 1f)
    assert(f.toArray.toSeq != hist.map(_ / png.length).toSeq)

    // real resize: decodable payload is transcoded, meta reflects new bytes
    val rs = Multimodal.resize(assets, 2, 2).head
    val rp = rs.getAs[Array[Byte]](2)
    assert(Multimodal.looksLikeImage(rp) && !java.util.Arrays.equals(rp, png))
    val rimg = Multimodal.decodeImage(rp).get
    assert(rimg.getWidth == 2 && rimg.getHeight == 2)
    assert(rs.getStruct(3).getLong(0) == rp.length.toLong)
    // non-image payloads keep the passthrough behavior
    val txt = Seq((8L, "audio", "not an image".getBytes("UTF-8"))).toDF("asset_id", "kind", "payload")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        length(col("payload")).cast("long").as("n_bytes"),
        lit(1).as("width"), lit(1).as("height"), lit(0L).as("duration_ms")))
    val ts = Multimodal.resize(txt, 2, 2).head
    assert(new String(ts.getAs[Array[Byte]](2), "UTF-8") == "not an image")
    assert(ts.getStruct(3).getInt(1) == 2 && ts.getStruct(3).getInt(2) == 2)
  }

  test("multimodal: a generated WAV decodes through the real audio kernel") {
    import spark.implicits._
    // 16-bit mono PCM: half the samples at -32768 (bucket 0), half at
    // +32767 (bucket 15) — a square wave whose amplitude histogram is known
    val n    = 64
    val rate = 8000
    def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
    }
    def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      le16(b, v & 0xffff); le16(b, (v >>> 16) & 0xffff)
    }
    val buf = new java.io.ByteArrayOutputStream()
    buf.write("RIFF".getBytes("US-ASCII")); le32(buf, 36 + 2 * n)
    buf.write("WAVE".getBytes("US-ASCII"))
    buf.write("fmt ".getBytes("US-ASCII")); le32(buf, 16)
    le16(buf, 1); le16(buf, 1) // PCM, mono
    le32(buf, rate); le32(buf, rate * 2); le16(buf, 2); le16(buf, 16)
    buf.write("data".getBytes("US-ASCII")); le32(buf, 2 * n)
    for (i <- 0 until n) le16(buf, if (i % 2 == 0) 0x8000 else 0x7fff)
    val wav = buf.toByteArray

    assert(Multimodal.looksLikeWav(wav))
    assert(!Multimodal.looksLikeWav("plain text longer than header".getBytes("UTF-8")))
    val pcm = Multimodal.decodeWav(wav).get
    assert(pcm.sampleRate == rate && pcm.channels == 1 && pcm.bitsPerSample == 16)
    assert(pcm.samples.length == n)
    assert(pcm.samples(0) == Short.MinValue && pcm.samples(1) == Short.MaxValue)

    val assets = Seq((9L, "audio", wav)).toDF("asset_id", "kind", "payload")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        length(col("payload")).cast("long").as("n_bytes"),
        lit(1).as("width"), lit(1).as("height"), lit(8L).as("duration_ms")))
    val f = Multimodal.decodeFeatures(assets, dim = 16).head.getSeq[Float](1)
    assert(f(0) == 0.5f && f(15) == 0.5f && f.sum == 1.0f,
      s"amplitude histogram wrong: $f")
    // and it differs from the byte-histogram fallback of the same bytes
    val hist = new Array[Float](16)
    wav.foreach(b => hist((b & 0xff) % 16) += 1f)
    assert(f.toArray.toSeq != hist.map(_ / wav.length).toSeq)

    // 8-bit WAV: unsigned samples rescale to signed 16-bit
    val b8 = new java.io.ByteArrayOutputStream()
    b8.write("RIFF".getBytes("US-ASCII")); le32(b8, 36 + 4)
    b8.write("WAVE".getBytes("US-ASCII"))
    b8.write("fmt ".getBytes("US-ASCII")); le32(b8, 16)
    le16(b8, 1); le16(b8, 1)
    le32(b8, rate); le32(b8, rate); le16(b8, 1); le16(b8, 8)
    b8.write("data".getBytes("US-ASCII")); le32(b8, 4)
    Seq(0, 128, 255, 64).foreach(b8.write)
    val pcm8 = Multimodal.decodeWav(b8.toByteArray).get
    assert(pcm8.bitsPerSample == 8 && pcm8.samples.toSeq ==
      Seq[Short](-32768, 0, 32512, -16384))

    // truncated / non-PCM payloads are rejected, not crashed on
    assert(Multimodal.decodeWav(wav.take(30)).isEmpty)
    val nonPcm = wav.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
  }

  test("multimodal: real image files ingest via the binaryFile source") {
    // the production ingestion path the asset fixture stands in for:
    // spark.read.format("binaryFile") over a directory of real images,
    // decoded by the same kernel
    val dir = java.nio.file.Files.createTempDirectory("graft_png").toFile
    try {
      for (i <- 0 until 3) {
        val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 4; x <- 0 until 4)
          img.setRGB(x, y, if ((x + y + i) % 2 == 0) 0x000000 else 0xffffff)
        javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, s"img$i.png"))
      }
      val assets = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(dir.getAbsolutePath)
        .select(
          abs(hash(col("path"))).cast("long").as("asset_id"),
          col("content").as("payload"))
      val feats = Multimodal.decodeFeatures(assets, dim = 16).collect()
      assert(feats.length == 3)
      feats.foreach { r =>
        val f = r.getSeq[Float](1)
        // checkerboards: half black (bucket 0), half white (bucket 15)
        assert(f(0) == 0.5f && f(15) == 0.5f, s"real decode wrong: $f")
      }
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("streaming near-dup verdicts equal the batch first-owner rule") {
    import graft.text.Dedup
    val dir = TestSpark.sf0001
    val docs = Tables.documents(spark, dir)
    val bands = Dedup.minhashBands(docs)
    val owners = bands.groupBy("band", "band_key").agg(min(col("doc_id")).as("owner"))
    val batch = bands.join(owners, Seq("band", "band_key"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bands"),
        sum((col("owner") < col("doc_id")).cast("long")).as("n_collided"))
      .orderBy("doc_id").collect()
    val stream = SparkEntry.queries("q_stream_neardup")(spark, dir)
      .select("doc_id", "n_bands", "n_collided").orderBy("doc_id").collect()
    assert(stream.length == batch.length && batch.nonEmpty)
    stream.zip(batch).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // at least one true near-dup collision exists in the fixture, else the
    // parity above is vacuous on the collided side
    assert(stream.exists(_.getLong(2) > 0), "fixture produced no band collisions")
  }

  test("multi-batch replay crosses real micro-batch boundaries and keeps parity") {
    import spark.implicits._
    // tumbling counts over the 4-file replay: ≥ 4 micro-batches, same result
    val stream = StreamOps.eventsStreamBatched(spark, TestSpark.sf0001, nFiles = 4)
    val q = StreamOps.tumblingCounts(stream, widthSec = 600)
      .writeStream.format("memory").queryName("stream_tumbling_mb")
      .outputMode("complete").start()
    q.processAllAvailable()
    val lastBatch = q.lastProgress.batchId
    q.stop()
    assert(lastBatch >= 3, s"expected ≥ 4 micro-batches, saw batchId $lastBatch")
    val got = spark.table("stream_tumbling_mb")
      .select(col("bucket"), col("event_type"), col("n"))
      .orderBy("bucket", "event_type").collect()
    val want = EventOps.tumbling(Tables.events(spark, TestSpark.sf0001), 600)
      .select(col("bucket"), col("event_type"), col("n"))
      .orderBy("bucket", "event_type").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }

    // sessionizer over the same replay: parity with batch, and the
    // EventTimeTimeout flush fires from WATERMARK ADVANCEMENT mid-stream —
    // some session must be emitted before the final micro-batch
    val ev = StreamOps.eventsStreamBatched(spark, TestSpark.sf0001, nFiles = 4)
      .select(col("user_id"), EventOps.epochSecNs(col("ts_ns")).as("es"), col("value"))
      .as[StreamOps.Ev]
    val sq = StreamOps.sessionizeStream(ev, gapSec = 1800, lateness = "1800500 milliseconds")
      .writeStream.format("memory").queryName("stream_sessions_mb")
      .outputMode("append").start()
    sq.processAllAvailable()
    val sawEarlyRows = sq.recentProgress.exists(p =>
      p.batchId < sq.lastProgress.batchId && p.sink.numOutputRows > 0)
    sq.stop()
    assert(sawEarlyRows, "no session was flushed before the final micro-batch")
    val got2 = spark.table("stream_sessions_mb")
      .select(col("user_id"), col("start_es"), col("end_es"), col("n_events"),
        col("sum_value_micros"))
      .orderBy("user_id", "start_es").collect()
    // a finite replay emits every closed session plus open sessions whose
    // last + gap fell behind the FINAL watermark — the same contract the
    // registered oracle replays; a user's still-open tail session stays
    // unflushed by design
    val events = Tables.events(spark, TestSpark.sf0001)
    val wmFinalMs = events.agg(max(EventOps.epochSecNs(col("ts_ns")))).head.getLong(0) *
      1000L - 1800500L
    val sess = EventOps.sessionStats(events, gapSec = 1800)
    val lastSeq = sess.groupBy("user_id")
      .agg(max(col("session_seq")).as("last_seq"))
    val want2 = sess.join(lastSeq, "user_id")
      .filter(col("session_seq") < col("last_seq") ||
        (col("end_es") + 1800L) * 1000L < wmFinalMs)
      .select(col("user_id"), col("start_es"), col("end_es"), col("n_events"),
        col("sum_value_micros"))
      .orderBy("user_id", "start_es").collect()
    assert(got2.length == want2.length,
      s"stream ${got2.length} sessions vs batch-flushable ${want2.length}")
    got2.zip(want2).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("streaming tumbling counts equal the batch operator") {
    val stream = StreamOps.eventsStream(spark, TestSpark.sf0001)
    val q = StreamOps.tumblingCounts(stream, widthSec = 600)
      .writeStream.format("memory").queryName("stream_tumbling")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("stream_tumbling")
      .select(col("bucket"), col("event_type"), col("n"))
      .orderBy("bucket", "event_type").collect()
    val want = EventOps.tumbling(Tables.events(spark, TestSpark.sf0001), 600)
      .select(col("bucket"), col("event_type"), col("n"))
      .orderBy("bucket", "event_type").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("stateful stream sessionizer matches batch sessionization counts") {
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), EventOps.epochSecNs(col("ts_ns")).as("es"),
        col("value"))
      .as[StreamOps.Ev]
    val sessions = StreamOps.sessionizeStream(ev, gapSec = 1800).collect()
    val batch = EventOps.sessionStats(Tables.events(spark, TestSpark.sf0001), 1800)
      .collect()
    // batch execution has no watermark, so only event-closed sessions emit
    // (one open session per user remains in state)
    val users = ev.select("user_id").distinct().count()
    assert(sessions.length == batch.length - users,
      s"${sessions.length} closed vs ${batch.length} total, $users users")
  }

  test("decodeWav rejects a crafted chunk size near 2^31 instead of crashing") {
    def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
    }
    def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      le16(b, v & 0xffff); le16(b, (v >>> 16) & 0xffff)
    }
    val buf = new java.io.ByteArrayOutputStream()
    buf.write("RIFF".getBytes("US-ASCII")); le32(buf, 100)
    buf.write("WAVE".getBytes("US-ASCII"))
    buf.write("fmt ".getBytes("US-ASCII")); le32(buf, 16)
    le16(buf, 1); le16(buf, 1); le32(buf, 8000); le32(buf, 16000); le16(buf, 2); le16(buf, 16)
    // data chunk claiming ~2^31 bytes: int arithmetic would overflow the
    // bound check negative and attempt a huge allocation / OOB read
    buf.write("data".getBytes("US-ASCII")); le32(buf, 0x7ffffff8)
    le16(buf, 42); le16(buf, 43) // 4 actual payload bytes
    assert(Multimodal.decodeWav(buf.toByteArray).isEmpty)
    // and an unsigned-range size (top bit set) is also a clean rejection
    val b2 = new java.io.ByteArrayOutputStream()
    b2.write("RIFF".getBytes("US-ASCII")); le32(b2, 100)
    b2.write("WAVE".getBytes("US-ASCII"))
    b2.write("data".getBytes("US-ASCII")); le32(b2, 0xfffffff0)
    assert(Multimodal.decodeWav(b2.toByteArray).isEmpty)
  }

  test("sessionizer flushes after a batch of pure duplicate-second deliveries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[StreamOps.Ev]
    val t0  = 1700000000L
    // batch 1: open sessions for users 1 and 2. Lateness must be > 0 so the
    // duplicate-second delivery below is ACCEPTED (not dropped as late) —
    // only an accepted event with es == stored last walks the
    // update-without-advancing-last path the regression lived on.
    mem.addData(StreamOps.Ev(1L, t0, 1.0), StreamOps.Ev(2L, t0 + 50, 5.0))
    val q = StreamOps.sessionizeStream(mem.toDS(), gapSec = 1800, lateness = "10 seconds")
      .writeStream.format("memory").queryName("sess_dup_rearm").outputMode("append").start()
    q.processAllAvailable()
    // batch 2: user 2 receives a DUPLICATE-second delivery (es == stored
    // last, so `last` does not advance). Spark clears the stored timeout on
    // every invocation — if the sessionizer skips re-arming here, user 2's
    // open session can never flush.
    mem.addData(StreamOps.Ev(2L, t0 + 50, 7.0))
    q.processAllAvailable()
    // batch 3: only user 1 speaks again; the watermark passes everyone's
    // last + gap, so user 2's session MUST surface via the re-armed timeout
    mem.addData(StreamOps.Ev(1L, t0 + 100000, 3.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess_dup_rearm").as[StreamOps.SessionOut]
      .collect().sortBy(r => (r.user_id, r.start_es))
    assert(rows.exists(r => r.user_id == 2 && r.start_es == t0 + 50 && r.end_es == t0 + 50
      && r.n_events == 2 && r.sum_value_micros == 12000000L),
      s"user-2 duplicate-delivery session missing: ${rows.mkString(",")}")
  }

  test("event-time timeout flushes final sessions without per-user sentinels") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[StreamOps.Ev]
    val t0  = 1700000000L
    mem.addData(
      StreamOps.Ev(1L, t0, 1.0), StreamOps.Ev(1L, t0 + 100, 2.0),
      StreamOps.Ev(2L, t0 + 50, 5.0))
    val q = StreamOps.sessionizeStream(mem.toDS(), gapSec = 1800, lateness = "0 seconds")
      .writeStream.format("memory").queryName("sess_timeout").outputMode("append").start()
    q.processAllAvailable()
    // a much-later event from user 1 pushes the watermark past everyone's
    // last + gap; user 2 NEVER sends another event, yet their session must
    // be flushed by the event-time timeout
    mem.addData(StreamOps.Ev(1L, t0 + 100000, 3.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess_timeout").as[StreamOps.SessionOut]
      .collect().sortBy(r => (r.user_id, r.start_es))
    assert(rows.exists(r => r.user_id == 1 && r.start_es == t0 && r.end_es == t0 + 100
      && r.n_events == 2 && r.sum_value_micros == 3000000L), s"user-1 session: ${rows.mkString(",")}")
    assert(rows.exists(r => r.user_id == 2 && r.start_es == t0 + 50 && r.end_es == t0 + 50
      && r.n_events == 1 && r.sum_value_micros == 5000000L), s"user-2 flush: ${rows.mkString(",")}")
    // user 1's newest session is genuinely still open — nothing else emitted
    assert(rows.length == 2, rows.mkString(","))
  }
}
