package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The Spark-side machinery (schema, batch iteration via mapPartitions,
  * partition sizing, output shapes) is real and tested; the codec kernels are
  * STUBS — this container has no image/audio libraries, so `decodeStub`
  * derives a deterministic fake feature vector from the payload bytes.
  * Swapping in a real decoder changes only the marked function body, nothing
  * about the distributed plan.
  */
object Multimodal {

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

  /** Decode + feature-extract, batched per partition. STUB KERNEL: the
    * "features" are a deterministic byte-histogram projection — replace the
    * body of `fakeDecode` with a real codec call; the mapPartitions shape
    * (one reusable buffer per partition, streaming iterator, fixed-width
    * output schema) is what a real decoder needs.
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
        var i = 0
        while (i < payload.length) { hist((payload(i) & 0xff) % dim) += 1f; i += 1 }
        val n = math.max(1, payload.length).toFloat
        Row(id, hist.map(_ / n).toSeq) // fakeDecode: byte histogram, normalized
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Resize stub: records the target size in meta; a real implementation
    * would transcode `payload` here (same projection shape).
    */
  def resize(assets: DataFrame, w: Int, h: Int): DataFrame =
    assets.withColumn("meta", struct(
      col("meta.n_bytes").as("n_bytes"),
      lit(w).as("width"), lit(h).as("height"),
      col("meta.duration_ms").as("duration_ms")))

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
