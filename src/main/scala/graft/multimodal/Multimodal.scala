package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support: media as opaque
  * `BinaryType` payloads plus typed metadata, with decode /
  * feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing is real and tested — schema, partition-size
  * control for large blobs, `mapPartitions` batch shape (the Scala
  * analogue of arrow-batched pandas UDFs), typed output encoders. The
  * codec itself is STUBBED (`StubCodec`): this container has no
  * image/audio libraries, so the byte→pixels step is a deterministic
  * fake with the same interface a JNI/FFmpeg-backed codec would have.
  * Swapping in a real codec changes exactly one function.
  */
object Multimodal {

  /** media table schema: one row per asset, payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType)))

  final case class MediaRow(media_id: Long, kind: String,
      payload: Array[Byte], format: String, width: Option[Int],
      height: Option[Int], duration_ms: Option[Int])

  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Int, checksum: Long, feature: Array[Float])

  /** ====== STUB ======
    * Deterministic fake decode: a real implementation would decode the
    * container format here (JPEG→pixels, WAV→PCM, MP4→frames). The fake
    * derives a stable 16-dim feature from the payload bytes so the
    * pipeline around it is fully testable. Interface (bytes → feature
    * vector) is exactly what a real codec-backed version exposes.
    */
  object StubCodec {
    val FeatureDim = 16

    def checksum(payload: Array[Byte]): Long =
      payload.foldLeft(1125899906842597L)((h, b) => h * 31 + (b & 0xff))

    def decodeToFeature(payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }

    /** Frame sampling stub: byte-range slices standing in for decoded
      * frames at a fixed stride.
      */
    def sampleFrames(payload: Array[Byte], nFrames: Int): Seq[Array[Byte]] = {
      val stride = math.max(payload.length / math.max(nFrames, 1), 1)
      (0 until nFrames)
        .map(i => payload.slice(i * stride,
          math.min(i * stride + stride, payload.length)))
        .filter(_.nonEmpty)
    }
  }

  /** Deterministic synthetic media table (payload bytes derived from the
    * id — stable across partitionings, no RNG).
    */
  def generate(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 256 + (id * 37 % 1024).toInt
      val payload = Array.tabulate[Byte](len)(i =>
        ((id * 131 + i * 31) & 0xff).toByte)
      MediaRow(id, kind, payload,
        format = kind match {
          case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
        },
        width = if (kind == "image") Some(64) else None,
        height = if (kind == "image") Some(64) else None,
        duration_ms = if (kind != "image") Some(1000 + (id % 9000).toInt)
        else None)
    }
  }

  /** Feature extraction over binary payloads. `mapPartitions` keeps the
    * per-row codec call inside one iterator pass (no per-row task
    * overhead); blob-heavy tables should be read with a small
    * `maxPartitionBytes` so a partition of payloads fits in memory — at
    * 100 TB this stage is embarrassingly parallel and shuffle-free.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      MediaFeatures(m.media_id, m.kind, m.payload.length,
        StubCodec.checksum(m.payload),
        StubCodec.decodeToFeature(m.payload))
    })
  }

  /** Frame sampling for video rows: one output row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap(m => StubCodec.sampleFrames(m.payload, nFrames)
        .zipWithIndex.map { case (frame, i) => (m.media_id, i, frame) })
      .toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Resize metadata transform (image rows): pure column math on typed
    * metadata — no decode needed for bookkeeping transforms.
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.filter(col("kind") === "image")
      .withColumn("scale",
        least(lit(maxSide) / col("width"), lit(maxSide) / col("height"),
          lit(1.0)))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
      .drop("payload")
}
