package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

/** Real video codec on JDK built-ins only: Motion-JPEG (or Motion-PNG)
  * frames in an AVI/RIFF container. MJPEG-in-AVI is the classic
  * baseline video format — every frame is an independent JPEG, the
  * container is RIFF chunk framing — which makes it the one video
  * format decodable with zero added dependencies: this file parses the
  * RIFF structure and `javax.imageio` decodes the frames.
  *
  * Container support is deliberately narrow and honest: AVI/MJPEG (and
  * the lossless Motion-PNG variant for exact-pixel tests). MP4/H.264
  * needs FFmpeg-class dependencies the environment doesn't have;
  * [[Multimodal.StubCodec]] remains the documented stand-in for those
  * formats only.
  *
  * Layout written (and the subset parsed): RIFF('AVI ') → LIST('hdrl')
  * [avih, LIST('strl')[strh('vids'), strf(BITMAPINFOHEADER)]] →
  * LIST('movi')['00dc' frame chunks] — the structure every MJPEG AVI
  * shares. The parser walks chunks by size (padding honored), takes
  * frame data from '00dc'/'00db' chunks, and reads timing from avih.
  */
object VideoCodec {
  val FeatureDim = 16

  // ---- RIFF primitives -------------------------------------------------

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  private def readLe32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc(id)); bos.write(le32(data.length)); bos.write(data)
    if (data.length % 2 == 1) bos.write(0) // RIFF chunks are word-aligned
    bos.toByteArray
  }

  private def list(listType: String, children: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc(listType)); bos.write(children)
    chunk("LIST", bos.toByteArray)
  }

  // ---- encode ----------------------------------------------------------

  /** Encode frames as an MJPEG (or MPNG) AVI. `frameFormat` is the
    * per-frame still codec: "jpg" (lossy, the real-world MJPEG case) or
    * "png" (lossless — exact-pixel round-trip for tests).
    */
  def makeAvi(frames: Seq[BufferedImage], fps: Int,
      frameFormat: String = "jpg"): Array[Byte] = {
    require(frames.nonEmpty && fps > 0, "need at least one frame and fps > 0")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val usecPerFrame = 1000000 / fps

    def still(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, frameFormat, bos)
      bos.toByteArray
    }

    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(usecPerFrame).putInt(0).putInt(0).putInt(0x10 /*HASINDEX off; fine*/)
      b.putInt(frames.length).putInt(0).putInt(1 /*streams*/).putInt(0)
      b.putInt(w).putInt(h)
      b.array()
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("vids")).put(fourcc(if (frameFormat == "png") "MPNG" else "MJPG"))
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(1 /*scale*/).putInt(fps /*rate*/)
      b.putInt(0).putInt(frames.length /*length*/)
      b.array()
    }
    val strf = { // BITMAPINFOHEADER
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(w).putInt(h)
      b.putShort(1).putShort(24)
      b.put(fourcc(if (frameFormat == "png") "MPNG" else "MJPG"))
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.map(f => chunk("00dc", still(f))).reduce(_ ++ _))

    val bos = new ByteArrayOutputStream()
    bos.write(fourcc("AVI ")); bos.write(hdrl); bos.write(movi)
    chunk("RIFF", bos.toByteArray)
  }

  // ---- decode ----------------------------------------------------------

  /** Raw still-image bytes of each frame, in stream order (no pixel
    * decode — frame EXTRACTION is container-only work).
    */
  def frameChunks(payload: Array[Byte]): Vector[Array[Byte]] = {
    require(payload.length >= 12 &&
      new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
      new String(payload, 8, 4, "US-ASCII") == "AVI ",
      "payload is not a RIFF/AVI container")
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(from: Int, until: Int): Unit = {
      var off = from
      while (off + 8 <= until) {
        val id = new String(payload, off, 4, "US-ASCII")
        val size = readLe32(payload, off + 4)
        val dataOff = off + 8
        // a corrupt/truncated container can carry a negative or oversized
        // LE32 here; without this check a negative size walks `off`
        // BACKWARDS (infinite loop) and an oversized one throws a raw
        // ArrayIndexOutOfBounds from copyOfRange. Compare in LONG
        // arithmetic: a size near Int.MaxValue wraps `dataOff + size`
        // negative and would slip past an int comparison.
        require(size >= 0 && dataOff.toLong + size <= until,
          s"corrupt RIFF chunk '$id' at offset $off: size $size exceeds " +
            s"enclosing extent $until")
        if (id == "LIST" && size >= 4) {
          val listType = new String(payload, dataOff, 4, "US-ASCII")
          if (listType == "movi" || listType == "hdrl" || listType == "strl")
            walk(dataOff + 4, dataOff + size)
        } else if (id == "00dc" || id == "00db") {
          frames += java.util.Arrays.copyOfRange(payload, dataOff, dataOff + size)
        }
        off = dataOff + size + (size % 2) // word alignment
      }
    }
    walk(12, payload.length)
    frames.result()
  }

  def decodeFrames(payload: Array[Byte]): Vector[BufferedImage] =
    frameChunks(payload).map { bytes =>
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "frame chunk is not a decodable still image")
      img
    }

  def frameCount(payload: Array[Byte]): Int = frameChunks(payload).length

  /** From the avih header: µs/frame × frame count. */
  def durationMs(payload: Array[Byte]): Int = {
    var result = -1
    def walk(from: Int, until: Int): Unit = {
      var off = from
      while (off + 8 <= until && result < 0) {
        val id = new String(payload, off, 4, "US-ASCII")
        val size = readLe32(payload, off + 4)
        val dataOff = off + 8
        require(size >= 0 && dataOff.toLong + size <= until, // long: no int wrap
          s"corrupt RIFF chunk '$id' at offset $off: size $size exceeds " +
            s"enclosing extent $until")
        if (id == "LIST" && size >= 4) walk(dataOff + 4, dataOff + size)
        else if (id == "avih" && size >= 20) {
          val usecPerFrame = readLe32(payload, dataOff)
          val totalFrames = readLe32(payload, dataOff + 16)
          result = (usecPerFrame.toLong * totalFrames / 1000).toInt
        }
        off = dataOff + size + (size % 2)
      }
    }
    walk(12, payload.length)
    require(result >= 0, "no avih header found")
    result
  }

  /** Temporal luminance envelope: frames bucketed into 16 time bins,
    * each bin the mean pixel luminance of its frames — the video
    * analogue of the audio RMS envelope (captures brightness motion
    * over time; dimension matches the other codecs' features).
    */
  def decodeToFeature(payload: Array[Byte]): Array[Float] = {
    val frames = decodeFrames(payload)
    val f = new Array[Float](FeatureDim)
    if (frames.isEmpty) return f
    val counts = new Array[Int](FeatureDim)
    var i = 0
    while (i < frames.length) {
      val bin = math.min(i * FeatureDim / frames.length, FeatureDim - 1)
      val g = ImageCodecSupport.meanLuminance(frames(i))
      f(bin) += g
      counts(bin) += 1
      i += 1
    }
    var b = 0
    while (b < FeatureDim) {
      if (counts(b) > 0) f(b) /= counts(b)
      b += 1
    }
    f
  }

  /** Every k-th frame's still-image bytes (container-only extraction —
    * the common "sample n frames for captioning/embedding" step).
    */
  def sampleFrames(payload: Array[Byte], nFrames: Int): Seq[Array[Byte]] = {
    val all = frameChunks(payload)
    if (all.isEmpty || nFrames <= 0) return Seq.empty
    val stride = math.max(1, all.length / nFrames)
    (0 until math.min(nFrames, all.length)).map(i =>
      all(math.min(i * stride, all.length - 1)))
  }

  /** Deterministic synthetic MJPEG AVI (used by [[Multimodal.generate]]):
    * id-seeded gradient frames with per-frame drift, really encoded —
    * downstream stages exercise the real container parser and JPEG
    * decoder.
    */
  def makeAviSample(id: Long, nFrames: Int, side: Int, fps: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { fno =>
      val img = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val r = ((id * 37 + fno * 11 + x * 3 + y) & 0xff).toInt
          val g = ((id * 59 + fno * 7 + x + y * 5) & 0xff).toInt
          val b = ((id * 83 + fno * 13 + x * 2 + y * 2) & 0xff).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      img
    }
    makeAvi(frames, fps)
  }
}

/** Shared pixel math (used by both image and video codecs). */
object ImageCodecSupport {
  /** Mean Rec.601 luminance over the whole frame, in [0, 1]. */
  def meanLuminance(img: BufferedImage): Float = {
    val w = img.getWidth; val h = img.getHeight
    var acc = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        acc += (0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)) / 255.0
        x += 1
      }
      y += 1
    }
    (acc / (w.toLong * h)).toFloat
  }
}
