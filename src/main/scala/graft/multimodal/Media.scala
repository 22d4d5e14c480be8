package graft.multimodal

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Hashing

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata.
  *
  * Container format for the synthetic corpus (deterministic, self-describing):
  * `"GRFT" | kind:1B (0=image 1=audio 2=video) | width:2B BE | height:2B BE |
  * payload…`. IMAGE payloads are REAL 24-bpp BMP files ([[Codec]] — a
  * self-contained byte→pixel decoder, since libjpeg/ffmpeg aren't in this
  * container), so the feature path exercises true decoding end to end;
  * [[decodeStub]] remains the clearly-marked stand-in for formats without a
  * bundled codec (the synthetic audio/video streams). Everything around the
  * decode — the binary column, header parse, per-partition batched loop,
  * frame explode, feature projection — is the production shape.
  */
object Media {

  val MAGIC: Array[Byte] = "GRFT".getBytes(UTF_8)
  val KIND_IMAGE = 0; val KIND_AUDIO = 1; val KIND_VIDEO = 2
  val FRAME_BYTES = 256 // synthetic "frame" stride for video payloads

  final case class MediaRow(url: String, kind: Int, media: Array[Byte])
  final case class MediaMeta(url: String, kind: Int, width: Int, height: Int,
      payloadBytes: Long, valid: Boolean)
  final case class Frame(url: String, frameIdx: Int, frame: Array[Byte])
  final case class MediaFeature(url: String, kind: Int, feature: Array[Float])

  // ------------------------------------------------------------ synth corpus

  /** Deterministic media table: one blob per id, kind = id % 3, payload
    * derived from a seeded byte stream. */
  def corpus(spark: SparkSession, n: Long, seed: Long): Dataset[MediaRow] = {
    import spark.implicits._
    val slices = math.max(spark.sparkContext.defaultParallelism * 4, 4)
    spark.range(0, n, 1, slices).map { i =>
      val kind = (i % 3).toInt
      val w = 16 + (i % 48).toInt
      val h = 16 + (i % 32).toInt
      val streamLen = kind match {
        case KIND_VIDEO => FRAME_BYTES * (2 + (i % 7).toInt) // 2..8 frames
        case KIND_AUDIO => 512 + (i % 512).toInt
        case _ => w * h * 3 // RGB raster for the real BMP below
      }
      val stream = new Array[Byte](streamLen)
      var j = 0
      var s = Hashing.splitmix64(seed * 31 + i)
      while (j < streamLen) { s = Hashing.splitmix64(s); stream(j) = s.toByte; j += 1 }
      // image payloads are REAL files: the seeded bytes become the pixel
      // raster of a 24-bpp BMP, so the decode path does true byte→pixel work
      val payload =
        if (kind == KIND_IMAGE) Codec.encodeBmp(Codec.Pixels(w, h, stream))
        else stream
      val payloadLen = payload.length
      val blob = new Array[Byte](9 + payloadLen)
      System.arraycopy(MAGIC, 0, blob, 0, 4)
      blob(4) = kind.toByte
      blob(5) = (w >> 8).toByte; blob(6) = w.toByte
      blob(7) = (h >> 8).toByte; blob(8) = h.toByte
      System.arraycopy(payload, 0, blob, 9, payloadLen)
      MediaRow(f"media://$seed%d/$i%010d", kind, blob)
    }
  }

  // ------------------------------------------------------------ header parse

  /** Pure header parse — no codec involved; bad blobs yield valid=false
    * instead of failing the task (poison-pill tolerance at corpus scale). */
  def parseHeader(url: String, blob: Array[Byte]): MediaMeta = {
    if (blob == null || blob.length < 9 || !blob.view.slice(0, 4).sameElements(MAGIC))
      MediaMeta(url, -1, 0, 0, if (blob == null) 0L else blob.length.toLong, valid = false)
    else {
      val kind = blob(4).toInt
      val w = ((blob(5) & 0xFF) << 8) | (blob(6) & 0xFF)
      val h = ((blob(7) & 0xFF) << 8) | (blob(8) & 0xFF)
      MediaMeta(url, kind, w, h, (blob.length - 9).toLong, valid = true)
    }
  }

  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(m => parseHeader(m.url, m.media)))
  }

  // ------------------------------------------------------------ decode

  /** Payload decode: REAL codec first — [[Codec.decodeImage]] parses 24-bpp
    * BMP and binary PPM byte-exactly — with [[decodeStub]] as the documented
    * fallback for formats without a bundled decoder. The strict parsers
    * cannot misfire on arbitrary bytes (header arithmetic is cross-checked
    * against the blob length), so the dispatch is safe on mixed corpora. */
  def decode(meta: MediaMeta, payload: Array[Byte]): Array[Byte] =
    Codec.decodeImage(payload).map(_.data).getOrElse(decodeStub(meta, payload))

  /** STUB — deterministic stand-in for decoders not bundled here (the
    * synthetic audio/video streams; ffmpeg is not in this container).
    * Returns a fixed-shape buffer derived from the payload so downstream
    * plumbing (batching, feature extraction, resize arithmetic) is exercised
    * with realistic shapes. Swap body for a real codec on a real cluster. */
  def decodeStub(meta: MediaMeta, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](math.max(meta.width * meta.height, 1))
    // poison-pill tolerance: a valid header with an EMPTY payload decodes to
    // the zeroed buffer instead of an out-of-bounds index
    if (payload.isEmpty) return out
    var i = 0
    while (i < out.length) { out(i) = payload(i % payload.length); i += 1 }
    out
  }

  /** Video frame sampling: every `stride`-th FRAME_BYTES-sized slice of the
    * payload becomes a row — the explode keeps frames co-partitioned with
    * their source blob (no shuffle). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      val meta = parseHeader(m.url, m.media)
      if (!meta.valid || meta.kind != KIND_VIDEO) Iterator.empty
      else {
        val nFrames = (meta.payloadBytes / FRAME_BYTES).toInt
        (0 until nFrames by stride).iterator.map { f =>
          val frame = new Array[Byte](FRAME_BYTES)
          System.arraycopy(m.media, 9 + f * FRAME_BYTES, frame, 0, FRAME_BYTES)
          Frame(m.url, f, frame)
        }
      }
    })
  }

  /** Batched per-partition feature extraction (decode — real codec for
    * image payloads, stub otherwise — → 32-dim float projection). The
    * `grouped(batchSize)` loop is the batch shape a real GPU/codec kernel
    * needs; the projection is deterministic. */
  def features(media: Dataset[MediaRow], dim: Int = 32, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val meta = parseHeader(m.url, m.media)
          val decoded =
            if (meta.valid) decode(meta, m.media.drop(9)) else Array.empty[Byte]
          val feat = new Array[Float](dim)
          var i = 0
          while (i < decoded.length) {
            feat(i % dim) += (decoded(i) & 0xFF) / 255.0f
            i += 1
          }
          // L2 normalize for cosine compatibility with ops.Similarity
          var nrm = 0.0
          i = 0
          while (i < dim) { nrm += feat(i) * feat(i); i += 1 }
          val inv = if (nrm > 0) (1.0 / math.sqrt(nrm)).toFloat else 0f
          i = 0
          while (i < dim) { feat(i) *= inv; i += 1 }
          MediaFeature(m.url, meta.kind, feat)
        }
      }
    }
  }

  /** DataFrame view with native binary-column pushable metadata. */
  def metaTable(media: Dataset[MediaRow]): DataFrame =
    extractMeta(media).toDF()
}
