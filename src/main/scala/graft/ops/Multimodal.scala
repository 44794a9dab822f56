package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` payloads + typed
  * metadata, processed in batched per-partition passes.
  *
  * The Spark-side plumbing here is REAL and tested — schema, typed
  * Dataset encoding of Array[Byte], partition-batched processing, stable
  * output shape. The codec step is a clearly-marked DETERMINISTIC STUB
  * (this container ships no image/audio libraries): `decodeStub` derives
  * plausible metadata and features purely from the bytes, so pipelines
  * and tests exercise the full distributed path; swap `decodeStub` for a
  * real codec (e.g. TwelveMonkeys/JavaCV) per media type in production.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int, // STUB-derived
      height: Int, // STUB-derived
      n_frames: Int, // STUB-derived (video/audio frames)
      content_hash: Long,
      embedding: Seq[Float]) // STUB-derived feature vector

  val EmbeddingDim = 8

  /** DETERMINISTIC FAKE DECODE — stands in for the media codec. */
  def decodeStub(kind: String, payload: Array[Byte])
      : (Int, Int, Int, Long, Seq[Float]) = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < payload.length) {
      h ^= payload(i)
      h *= 0x100000001B3L
      i += 1
    }
    val w = 64 + (math.abs(h) % 1024).toInt
    val hh = 64 + (math.abs(h >>> 17) % 1024).toInt
    val frames = kind match {
      case "video" => 1 + (math.abs(h >>> 29) % 300).toInt
      case "audio" => 1 + (math.abs(h >>> 23) % 10000).toInt
      case _       => 1
    }
    val emb = (0 until EmbeddingDim).map(d =>
      (((MinHashDedup.mix64(h + d) >>> 11) * 1.1102230246251565e-16) * 2
        - 1).toFloat)
    (w, hh, frames, h, emb)
  }

  /** Batched feature extraction: one pass per partition, decoder state
    * (in production: the codec instance) initialized once per partition
    * like the reference's per-worker engine init resources
    * (vkit/engine/interface.py:59-85).
    */
  def extractFeatures(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (heavyweight codec)
      it.map { m =>
        val (w, h, frames, hash, emb) = decodeStub(m.kind, m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, w, h,
          frames, hash, emb)
      }
    }
  }

  /** Deterministic synthetic media table (no external data). */
  def synthMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val len = 128 + (MinHashDedup.mix64(i) & 0x3FF).toInt
      val bytes = new Array[Byte](len)
      var j = 0
      var s = MinHashDedup.mix64(i * 31 + 7)
      while (j < len) {
        bytes(j) = (s & 0xFF).toByte
        s = MinHashDedup.mix64(s)
        j += 1
      }
      MediaRow(i, kind, bytes)
    }
  }
}
