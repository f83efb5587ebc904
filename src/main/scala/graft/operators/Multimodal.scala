package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `binary` columns with typed metadata;
  * decode / feature-extraction / resize / frame-sampling run partition-wise
  * so codec state is initialized once per partition, not per row (the
  * Scala analogue of arrow-batched `mapInPandas` UDFs).
  *
  * Two decoder implementations ship:
  *  - [[JdkDecoder]] — REAL decode using only the JDK: PNG/BMP/JPEG via
  *    `javax.imageio`, WAV-PCM via `javax.sound.sampled`, and
  *    frame-sampled "video" as a length-prefixed PNG frame container
  *    (the JDK has no video codec; the container walk + per-frame decode
  *    + stride sampling is the real pipeline shape).
  *  - [[StubDecoder]] — deterministic byte-projection stand-in for codecs
  *    the JVM lacks (H.264 etc.); swap in a JNI/ffmpeg-backed
  *    [[MediaDecoder]] in production and nothing else changes.
  */
object Multimodal {

  case class Media(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  case class MediaFeatures(media_id: Long, kind: String, feature: Array[Float],
      out_width: Int, out_height: Int, n_sampled_frames: Int)

  /** Per-partition decoder contract: `open()` once per partition (codec
    * init / model load), then `decode` per record.
    */
  trait MediaDecoder extends Serializable {
    def open(): Unit
    def decode(m: Media, targetW: Int, targetH: Int, frameStride: Int): MediaFeatures
  }

  /** Deterministic stand-in for a real codec: "features" are a fixed-size
    * projection of the byte content. Real decode is intentionally
    * unimplemented here — see class docs.
    */
  class StubDecoder(dim: Int = 16) extends MediaDecoder {
    def open(): Unit = ()
    def decode(m: Media, targetW: Int, targetH: Int, frameStride: Int): MediaFeatures = {
      val f = new Array[Float](dim)
      var i = 0
      while (i < m.bytes.length) {
        f(i % dim) += (m.bytes(i) & 0xff) / 255.0f
        i += 1
      }
      val sampled = if (m.kind == "video") (m.n_frames + frameStride - 1) / frameStride else 1
      MediaFeatures(m.media_id, m.kind, f, targetW, targetH, sampled)
    }
  }

  /** Real decode with JDK-only codecs. Features: `grid`×`grid` mean
    * luminance cells of the (nearest-neighbor target-resampled) image, or
    * per-bucket RMS energy for audio; video averages the sampled frames'
    * image features.
    */
  class JdkDecoder(grid: Int = 4) extends MediaDecoder {
    def open(): Unit = () // ImageIO/AudioSystem are stateless; real codecs init here

    private def imageFeature(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image bytes")
      val f = new Array[Float](grid * grid)
      val counts = new Array[Int](grid * grid)
      val imgW = img.getWidth
      val px = img.getRGB(0, 0, imgW, img.getHeight, null, 0, imgW)
      var y = 0
      while (y < targetH) {
        val sy = y * img.getHeight / targetH
        var x = 0
        while (x < targetW) {
          val sx = x * img.getWidth / targetW
          val rgb = px(sy * imgW + sx)
          val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3f * 255f)
          val cell = (y * grid / targetH) * grid + (x * grid / targetW)
          f(cell) += lum; counts(cell) += 1
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < f.length) { if (counts(i) > 0) f(i) /= counts(i); i += 1 }
      f
    }

    private def audioFeature(bytes: Array[Byte]): Array[Float] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val pcm = in.readAllBytes()
      in.close()
      val nSamples = pcm.length / 2 // 16-bit mono PCM
      val dim = grid * grid
      val f = new Array[Float](dim)
      val counts = new Array[Int](dim)
      var i = 0
      while (i < nSamples) {
        val lo = pcm(2 * i) & 0xff
        val hi = pcm(2 * i + 1).toInt
        val s = ((hi << 8) | lo).toShort / 32768f
        val bucket = if (nSamples == 0) 0 else math.min(i * dim / nSamples, dim - 1)
        f(bucket) += s * s; counts(bucket) += 1
        i += 1
      }
      i = 0
      while (i < dim) {
        if (counts(i) > 0) f(i) = math.sqrt(f(i) / counts(i)).toFloat
        i += 1
      }
      f
    }

    def decode(m: Media, targetW: Int, targetH: Int, frameStride: Int): MediaFeatures =
      m.kind match {
        case "image" =>
          MediaFeatures(m.media_id, m.kind, imageFeature(m.bytes, targetW, targetH),
            targetW, targetH, 1)
        case "audio" =>
          MediaFeatures(m.media_id, m.kind, audioFeature(m.bytes), 0, 0, 1)
        case "video" =>
          // length-prefixed PNG frame container; decode every strideth frame
          val bb = java.nio.ByteBuffer.wrap(m.bytes)
          val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          while (bb.remaining() >= 4) {
            val len = bb.getInt
            val frame = new Array[Byte](len)
            bb.get(frame)
            frames += frame
          }
          val sampled = frames.indices.by(frameStride).map(i =>
            imageFeature(frames(i), targetW, targetH))
          val f = new Array[Float](grid * grid)
          sampled.foreach(s => (0 until f.length).foreach(i => f(i) += s(i)))
          if (sampled.nonEmpty) (0 until f.length).foreach(i => f(i) /= sampled.size)
          MediaFeatures(m.media_id, m.kind, f, targetW, targetH, sampled.size)
        case other =>
          throw new IllegalArgumentException(
            s"JdkDecoder: unsupported media kind '$other' (media_id=${m.media_id})")
      }
  }

  implicit val mediaEnc: Encoder[Media] = Encoders.product[Media]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Decode + resize + frame-sample, partition-wise. */
  def extractFeatures(media: Dataset[Media], decoder: MediaDecoder,
      targetW: Int = 224, targetH: Int = 224, frameStride: Int = 10): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      decoder.open()
      it.map(m => decoder.decode(m, targetW, targetH, frameStride))
    }

  /** Deterministic synthetic media corpus for tests/benches (no binary
    * testdata ships with the harness).
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[Media] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val bytes = Array.tabulate[Byte](64 + (id % 64).toInt)(j => ((id * 31 + j * 7) % 251).toByte)
      Media(id, kind, bytes, 640, 480, 16000, 100)
    }
  }

  /** REAL deterministic media bytes, JDK-encodable end-to-end: PNG images,
    * 16-bit mono WAV audio, and a length-prefixed PNG frame container for
    * video. Pixel/sample content is a pure function of (id, position).
    */
  def syntheticRealMedia(spark: SparkSession, n: Int): Dataset[Media] = {
    import spark.implicits._
    spark.range(n).map { id =>
      (id % 3) match {
        case 0 =>
          Media(id, "image", pngBytes(id, 32, 24), 32, 24, 0, 1)
        case 1 =>
          Media(id, "audio", wavBytes(id, 800), 0, 0, 8000, 0)
        case _ =>
          val frames = (0 until 6).map(f => pngBytes(id * 101 + f, 16, 12))
          val bb = java.nio.ByteBuffer.allocate(frames.map(_.length + 4).sum)
          frames.foreach { fr => bb.putInt(fr.length); bb.put(fr) }
          Media(id, "video", bb.array(), 16, 12, 0, 6)
      }
    }
  }

  case class MediaIntStats(media_id: Long, kind: String, n_units: Long,
      sum_v: Long, checksum: Long)

  implicit val statsEnc: Encoder[MediaIntStats] = Encoders.product[MediaIntStats]

  /** Decode to EXACT integer statistics: per medium, the unit count
    * (samples / pixels), the sum of decoded values, and a position-weighted
    * checksum — all integers, so a SQL oracle that knows the synthesis
    * formula can verify the REAL codec roundtrip (PNG and WAV are
    * lossless) bit-for-bit without any float accumulation.
    */
  def integerStats(media: Dataset[Media]): Dataset[MediaIntStats] =
    media.mapPartitions { it =>
      it.map { m =>
        m.kind match {
          case "audio" =>
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(m.bytes))
            val pcm = in.readAllBytes()
            in.close()
            val n = pcm.length / 2
            var sum = 0L; var chk = 0L
            var i = 0
            while (i < n) {
              val s = (((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff)).toShort).toLong
              sum += math.abs(s)
              chk += s * (i + 1)
              i += 1
            }
            MediaIntStats(m.media_id, m.kind, n, sum, chk)
          case "image" =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(m.bytes))
            require(img != null, "undecodable image bytes")
            val (w, h) = (img.getWidth, img.getHeight)
            // bulk getRGB: the per-pixel accessor converts through the
            // color model on every call
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var sum = 0L; var chk = 0L
            var i = 0
            while (i < px.length) {
              val v = (px(i) & 0xff).toLong
              sum += v
              chk += v * (i + 1)
              i += 1
            }
            MediaIntStats(m.media_id, m.kind, w.toLong * h, sum, chk)
          case other =>
            throw new IllegalArgumentException(s"integerStats: kind '$other'")
        }
      }
    }

  /** Media corpus keyed by an id column: even ids get real WAV audio,
    * odd ids real PNG images — content a pure integer function of the id,
    * mirrored by the SQL oracle.
    */
  def mediaFromIds(ids: Dataset[Long]): Dataset[Media] = {
    import ids.sparkSession.implicits._
    ids.map { id =>
      if (id % 2 == 0) Media(id, "audio", wavBytes(id, 800), 0, 0, 8000, 0)
      else Media(id, "image", pngBytes(id, 32, 24), 32, 24, 0, 1)
    }
  }

  private def pngBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // one bulk setRGB: per-pixel setRGB pays a color-model conversion per
    // call and dominates the synthesis cost
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((seed * 31 + x * 7 + y * 13) % 256).toInt & 0xff
        px(y * w + x) = (v << 16) | (v << 8) | v
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(seed: Long, nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples) {
      val s = (((seed * 17 + i * 11) % 2001) - 1000).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
