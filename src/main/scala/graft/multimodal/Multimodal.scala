package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support: media as opaque
  * `BinaryType` payloads plus typed metadata, with decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing is real and tested — schema, partition-size
  * control for large blobs, `mapPartitions` batch shape (the Scala
  * analogue of arrow-batched pandas UDFs), typed output encoders.
  *
  * All three kinds run REAL codecs on JDK built-ins: images via
  * `javax.imageio` PNG ([[ImageCodec]]), audio via
  * `javax.sound.sampled` WAV/PCM ([[AudioCodec]]), video via
  * MJPEG-in-AVI ([[VideoCodec]] — RIFF container parsing + per-frame
  * JPEG decode). [[StubCodec]] remains only as the documented
  * stand-in for container formats that genuinely need external
  * libraries (MP4/H.264); swapping a real one in changes exactly one
  * dispatch arm.
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

  /** Real image codec on `javax.imageio` (JDK-built-in PNG/BMP/GIF
    * readers — zero added dependencies). Features are 4×4 grid mean
    * luminances of the DECODED PIXELS (16-dim, matching StubCodec's
    * dimension so the two paths share the `MediaFeatures` schema), and
    * resize is an explicit nearest-neighbor kernel — deterministic,
    * unlike `Graphics2D` interpolation which may vary by rendering
    * pipeline.
    */
  object ImageCodec {
    val FeatureDim = 16
    private val Grid = 4

    def decode(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      img
    }

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Mean Rec.601 luminance per cell of a Grid×Grid partition of the
      * image, row-major; cells outside a tiny image stay 0.
      */
    def gridLuminance(img: java.awt.image.BufferedImage): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      val counts = new Array[Int](FeatureDim)
      val w = img.getWidth; val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (0.299f * ((rgb >> 16) & 0xff) +
            0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)) / 255.0f
          val cell = math.min(y * Grid / h, Grid - 1) * Grid +
            math.min(x * Grid / w, Grid - 1)
          f(cell) += lum
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < FeatureDim) {
        if (counts(i) > 0) f(i) /= counts(i)
        i += 1
      }
      f
    }

    def decodeToFeature(payload: Array[Byte]): Array[Float] =
      gridLuminance(decode(payload))

    /** Downscale so max(side) ≤ maxSide (never upscales), nearest-
      * neighbor sampling, re-encoded as PNG.
      */
    def resize(payload: Array[Byte], maxSide: Int): Array[Byte] = {
      val img = decode(payload)
      val w = img.getWidth; val h = img.getHeight
      val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
      val tw = math.max(1, (w * scale).toInt)
      val th = math.max(1, (h * scale).toInt)
      if (tw == w && th == h) return encodePng(img)
      val out = new java.awt.image.BufferedImage(tw, th,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < th) {
        var x = 0
        while (x < tw) {
          out.setRGB(x, y, img.getRGB(x * w / tw, y * h / th))
          x += 1
        }
        y += 1
      }
      encodePng(out)
    }

    /** Deterministic synthetic PNG (used by [[generate]]): a smooth
      * id-seeded RGB gradient, actually encoded — downstream stages
      * exercise the real decoder.
      */
    def makePng(id: Long, side: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(side, side,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val r = ((id * 37 + x * 3 + y) & 0xff).toInt
          val g = ((id * 59 + x + y * 5) & 0xff).toInt
          val b = ((id * 83 + x * 2 + y * 2) & 0xff).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }
  }

  /** Real audio codec on `javax.sound.sampled` (JDK-built-in WAV/PCM
    * support — zero added dependencies): WAV container decode to 16-bit
    * PCM samples, a 16-bin RMS energy envelope as the feature vector,
    * and a deterministic synthesized-tone encoder for the generator.
    */
  object AudioCodec {
    val FeatureDim = 16
    val SampleRate = 8000f

    private def pcmFormat = new javax.sound.sampled.AudioFormat(
      SampleRate, 16, 1, true /* signed */, false /* little-endian */)

    /** WAV bytes → 16-bit signed PCM samples. */
    def decodePcm(payload: Array[Byte]): Array[Short] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val bytes = in.readAllBytes()
        require(in.getFormat.getSampleSizeInBits == 16 &&
          !in.getFormat.isBigEndian, s"expected 16-bit LE PCM, got ${in.getFormat}")
        val out = new Array[Short](bytes.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
          i += 1
        }
        out
      } finally in.close()
    }

    /** 16-bin RMS energy envelope of the decoded samples, each bin in
      * [0, 1] (normalized by the 16-bit full scale).
      */
    def decodeToFeature(payload: Array[Byte]): Array[Float] = {
      val pcm = decodePcm(payload)
      val f = new Array[Float](FeatureDim)
      if (pcm.isEmpty) return f
      val binLen = math.max(1, pcm.length / FeatureDim)
      var b = 0
      while (b < FeatureDim) {
        val from = b * binLen
        val until = math.min(if (b == FeatureDim - 1) pcm.length
          else (b + 1) * binLen, pcm.length)
        if (from < until) {
          var acc = 0.0
          var i = from
          while (i < until) { acc += pcm(i).toDouble * pcm(i); i += 1 }
          f(b) = (math.sqrt(acc / (until - from)) / 32768.0).toFloat
        }
        b += 1
      }
      f
    }

    def durationMs(payload: Array[Byte]): Int = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try (in.getFrameLength * 1000 / in.getFormat.getFrameRate).toInt
      finally in.close()
    }

    def encodeWav(pcm: Array[Short]): Array[Byte] = {
      val bytes = new Array[Byte](pcm.length * 2)
      var i = 0
      while (i < pcm.length) {
        bytes(2 * i) = (pcm(i) & 0xff).toByte
        bytes(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
        i += 1
      }
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), pcmFormat, pcm.length)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Deterministic synthetic WAV (used by [[generate]]): a two-tone
      * id-seeded waveform, actually containerized — downstream stages
      * exercise the real decoder.
      */
    def makeWav(id: Long, ms: Int): Array[Byte] = {
      val n = (SampleRate * ms / 1000).toInt
      val f1 = 200.0 + (id % 17) * 50.0
      val f2 = 600.0 + (id % 11) * 80.0
      val pcm = Array.tabulate[Short](n) { i =>
        val t = i / SampleRate.toDouble
        val v = 0.4 * math.sin(2 * math.Pi * f1 * t) +
          0.3 * math.sin(2 * math.Pi * f2 * t)
        (v * 32767).toShort
      }
      encodeWav(pcm)
    }
  }

  /** ====== STUB (non-AVI video containers only) ======
    * Deterministic fake decode for formats that need FFmpeg-class
    * dependencies (MP4/H.264). AVI/MJPEG video is decoded for real by
    * [[VideoCodec]]; this fake keeps the pipeline testable for other
    * containers with the same bytes→feature interface, and provides
    * the shared payload checksum.
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

  /** Deterministic synthetic media table (payloads derived from the id —
    * stable across partitionings, no RNG). Image rows carry REAL PNG
    * bytes, audio rows REAL WAV bytes, video rows REAL MJPEG AVI bytes
    * — every decode path downstream is an actual decoder.
    */
  def generate(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val ms = 1000 + (id % 9000).toInt
      val payload = kind match {
        case "image" => ImageCodec.makePng(id, 64)
        case "audio" => AudioCodec.makeWav(id, ms)
        case _ =>
          VideoCodec.makeAviSample(id, nFrames = 4 + (id % 9).toInt,
            side = 32, fps = 4)
      }
      MediaRow(id, kind, payload,
        format = kind match {
          case "image" => "png"; case "audio" => "wav"; case _ => "avi"
        },
        width = if (kind == "image") Some(64) else None,
        height = if (kind == "image") Some(64) else None,
        duration_ms = kind match {
          case "audio" => Some(ms)
          case "video" => Some(VideoCodec.durationMs(payload))
          case _ => None
        })
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
      val feature = m.kind match {
        case "image" => ImageCodec.decodeToFeature(m.payload)
        case "audio" => AudioCodec.decodeToFeature(m.payload)
        case "video" if m.format == "avi" =>
          VideoCodec.decodeToFeature(m.payload)
        case _ => StubCodec.decodeToFeature(m.payload)
      }
      MediaFeatures(m.media_id, m.kind, m.payload.length,
        StubCodec.checksum(m.payload), feature)
    })
  }

  /** Real image resize: decode → nearest-neighbor downscale → PNG
    * re-encode, one codec call per row inside a partition pass. The
    * metadata-only [[resizePlan]] remains for bookkeeping transforms
    * that shouldn't touch pixels.
    */
  def resizeImages(media: Dataset[MediaRow], maxSide: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .mapPartitions(_.map { m =>
        val resized = ImageCodec.resize(m.payload, maxSide)
        val img = ImageCodec.decode(resized)
        (m.media_id, img.getWidth, img.getHeight, resized)
      })
      .toDF("media_id", "out_width", "out_height", "payload")
  }

  /** Frame sampling for video rows: one output row per sampled frame —
    * REAL container-level extraction for AVI (each frame_bytes is a
    * decodable JPEG still), byte-slice stub for other formats.
    */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap { m =>
        val frames =
          if (m.format == "avi") VideoCodec.sampleFrames(m.payload, nFrames)
          else StubCodec.sampleFrames(m.payload, nFrames)
        frames.zipWithIndex.map { case (frame, i) => (m.media_id, i, frame) }
      }
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
