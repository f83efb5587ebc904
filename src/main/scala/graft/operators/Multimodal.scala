package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `binary` columns with typed metadata;
  * decode / feature-extraction / resize / frame-sampling run partition-wise
  * so codec state is initialized once per partition, not per row (the
  * Scala analogue of arrow-batched `mapInPandas` UDFs).
  *
  * The actual codecs are STUBBED (`StubDecoder`) — this container has no
  * image/audio libraries — but the Spark-side contract is real and tested:
  * schema, encoders, per-partition batching, and deterministic outputs.
  * Swap [[MediaDecoder]] with a JNI/ffmpeg-backed implementation in
  * production; nothing else changes.
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
}
