package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` payloads + typed
  * metadata, processed in batched per-partition passes.
  *
  * MEDIA-1 (frozen decode spec):
  *  - container-header METADATA (format, width, height, frame count) is
  *    parsed for REAL from the payload bytes for PNG (IHDR), GIF
  *    (logical screen descriptor), BMP (BITMAPINFOHEADER), JPEG (SOFn
  *    marker scan) and WAV (RIFF chunk walk) — fixed-offset byte reads
  *    per the published container specs, no codec libraries needed;
  *  - payloads with unrecognized/invalid magic fall back to the
  *    DETERMINISTIC STUB (`decodeStub`, format = "unknown"), which
  *    derives plausible values purely from the bytes; pixel/sample
  *    DECODE (vs header metadata) stays stubbed — this container ships
  *    no image/audio libraries; swap the embedding/content branch for a
  *    real codec (e.g. TwelveMonkeys/JavaCV) in production;
  *  - stills (png/bmp/jpeg) report n_frames = 1; GIF reports its image-
  *    descriptor count from the block walk (animated GIFs get real
  *    frame counts, min 1); WAV reports data-chunk sample frames
  *    (dataSize / blockAlign); width/height are 0 for audio.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      format: String, // parsed container format, or "unknown"
      n_bytes: Long,
      width: Int, // header-parsed; STUB-derived for unknown
      height: Int, // header-parsed; STUB-derived for unknown
      n_frames: Int, // header-parsed; STUB-derived for unknown
      content_hash: Long,
      embedding: Seq[Float]) // STUB-derived feature vector

  val EmbeddingDim = 8

  // ---- real container-header parsers (MEDIA-1) -------------------------

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def be16(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)
  @inline private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  @inline private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  @inline private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    (0 until s.length).forall(j => b(i + j) == s.charAt(j).toByte)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first per the
    * spec): width/height as big-endian u32 at offsets 16/20.
    */
  def parsePng(b: Array[Byte]): Option[(String, Int, Int, Int)] =
    if (b.length >= 24 &&
      u8(b, 0) == 0x89 && ascii(b, 1, "PNG") &&
      u8(b, 4) == 0x0D && u8(b, 5) == 0x0A && u8(b, 6) == 0x1A &&
      u8(b, 7) == 0x0A && ascii(b, 12, "IHDR"))
      Some(("png", be32(b, 16).toInt, be32(b, 20).toInt, 1))
    else None

  /** GIF87a/GIF89a: logical screen width/height, little-endian u16 at
    * offsets 6/8; frame count = number of image descriptors (0x2C)
    * found by the block walk (extensions are 0x21 + label + sub-block
    * chains; color tables are 3 * 2^(depth+1) bytes). A header-only or
    * malformed tail reports the frames counted so far, min 1.
    */
  def parseGif(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length < 13 ||
      !(ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a"))) return None
    val (w, h) = (le16(b, 6), le16(b, 8))
    var frames = 0
    var p = 13
    // global color table if the packed flag (bit 7 at offset 10) is set
    if ((u8(b, 10) & 0x80) != 0) p += 3 * (1 << ((u8(b, 10) & 7) + 1))
    def skipSubBlocks(): Boolean = {
      while (p < b.length && u8(b, p) != 0) p += 1 + u8(b, p)
      if (p >= b.length) false else { p += 1; true } // consume terminator
    }
    var ok = true
    while (ok && p < b.length && u8(b, p) != 0x3B) {
      u8(b, p) match {
        case 0x21 => // extension: introducer + label + sub-blocks
          p += 2
          ok = skipSubBlocks()
        case 0x2C => // image descriptor
          if (p + 10 > b.length) ok = false
          else {
            frames += 1
            val packed = u8(b, p + 9)
            p += 10
            if ((packed & 0x80) != 0) p += 3 * (1 << ((packed & 7) + 1))
            p += 1 // LZW minimum code size
            ok = skipSubBlocks()
          }
        case _ => ok = false // unknown block: stop counting
      }
    }
    Some(("gif", w, h, math.max(1, frames)))
  }

  /** BMP: "BM" file header + BITMAPINFOHEADER (DIB size 40 at offset
    * 14): width LE i32 at 18, height LE i32 at 22 (negative = top-down;
    * report magnitude).
    */
  def parseBmp(b: Array[Byte]): Option[(String, Int, Int, Int)] =
    if (b.length >= 30 && ascii(b, 0, "BM") && le32(b, 14) == 40L)
      Some(("bmp", le32(b, 18).toInt,
        math.abs(le32(b, 22).toInt.toLong).toInt, 1))
    else None

  /** JPEG: SOI then a marker walk; dimensions live in the first SOFn
    * segment (C0-CF except C4/C8/CC): height BE u16 at sof+5, width at
    * sof+7.
    */
  def parseJpeg(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
    var p = 2
    while (p + 3 < b.length && u8(b, p) == 0xFF) {
      val m = u8(b, p + 1)
      if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
        if (p + 8 >= b.length) return None
        return Some(("jpeg", be16(b, p + 7), be16(b, p + 5), 1))
      } else if (m == 0xD9 || m == 0xDA) {
        return None // hit EOI / scan data without a SOF
      } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        p += 2 // TEM / RSTn are standalone markers with no length field
      } else {
        p += 2 + be16(b, p + 2)
      }
    }
    None
  }

  /** WAV: RIFF/WAVE chunk walk; blockAlign from the fmt chunk, frame
    * count = data chunk size / blockAlign. Width/height are 0.
    */
  def parseWav(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE"))
      return None
    var p = 12
    var blockAlign = 0
    var dataSize = -1L
    while (p + 8 <= b.length && (blockAlign == 0 || dataSize < 0)) {
      val size = le32(b, p + 4) // u32 as Long: never negative, and the
      // Long addition below cannot wrap p backwards on a hostile size
      // (a truncated-chunk p just exits the loop bound)
      if (ascii(b, p, "fmt ") && p + 22 + 2 <= b.length)
        blockAlign = le16(b, p + 20)
      else if (ascii(b, p, "data"))
        dataSize = size
      val next = p.toLong + 8L + size + (size & 1L) // word-aligned
      if (next > Int.MaxValue) return None
      p = next.toInt
    }
    if (blockAlign > 0 && dataSize >= 0)
      Some(("wav", 0, 0, (dataSize / blockAlign).toInt))
    else None
  }

  /** First matching container parser, or None (-> stub fallback). */
  def parseContainerHeader(b: Array[Byte])
      : Option[(String, Int, Int, Int)] =
    parsePng(b).orElse(parseGif(b)).orElse(parseBmp(b))
      .orElse(parseJpeg(b)).orElse(parseWav(b))

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
    * (vkit/engine/interface.py:59-85). Header metadata is REAL for
    * recognized containers (MEDIA-1); unknown magic falls back to the
    * stub.
    */
  def extractFeatures(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (heavyweight codec)
      it.map { m =>
        val (w0, h0, f0, hash, emb) = decodeStub(m.kind, m.payload)
        val (fmt, w, h, frames) = parseContainerHeader(m.payload)
          .getOrElse(("unknown", w0, h0, f0))
        MediaFeatures(m.media_id, m.kind, fmt, m.payload.length.toLong,
          w, h, frames, hash, emb)
      }
    }
  }

  // ---- deterministic container synthesis (for tests/oracles) ----------

  /** Deterministic per-id container dimensions (mirrored in SQL by the
    * t_media_headers oracle). Frames: wav samples = 100 + id % 1000;
    * gif image descriptors = 1 + id % 5.
    */
  def synthDims(id: Long): (Int, Int, Int) =
    ((16 + (id * 7) % 509).toInt, (16 + (id * 13) % 509).toInt,
      (100 + id % 1000).toInt)

  def synthGifFrames(id: Long): Int = (1 + id % 5).toInt

  /** A real, minimal container file for id: id%5 picks png/gif/bmp/
    * jpeg/wav; dims/frames from synthDims/synthGifFrames. Byte-exact
    * sizes: png 45, gif 14 + 22*frames (animated: GCE + image
    * descriptor + 1-byte data sub-block per frame), bmp 54, jpeg 35,
    * wav 44 + 2*frames.
    */
  def synthContainer(id: Long): Array[Byte] = {
    val (w, h, frames) = synthDims(id)
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xFF))
    def s(str: String): Unit = str.foreach(c => out.write(c.toInt))
    def be16(v: Int): Unit = b(v >>> 8, v)
    def le16(v: Int): Unit = b(v, v >>> 8)
    def be32(v: Int): Unit = b(v >>> 24, v >>> 16, v >>> 8, v)
    def le32(v: Int): Unit = b(v, v >>> 8, v >>> 16, v >>> 24)
    (id % 5) match {
      case 0 => // PNG: sig + IHDR + IEND
        b(0x89); s("PNG"); b(0x0D, 0x0A, 0x1A, 0x0A)
        be32(13); s("IHDR"); be32(w); be32(h)
        b(8, 2, 0, 0, 0) // depth 8, truecolor, deflate, none, no interlace
        be32(0) // crc (not verified by header parsers)
        be32(0); s("IEND"); be32(0)
      case 1 => // GIF89a: animated — GCE + image descriptor per frame
        s("GIF89a"); le16(w); le16(h); b(0, 0, 0)
        for (_ <- 0 until synthGifFrames(id)) {
          b(0x21, 0xF9, 0x04, 0, 0, 0, 0, 0x00) // graphic control ext
          b(0x2C); le16(0); le16(0); le16(w); le16(h); b(0) // descriptor
          b(0x02) // LZW minimum code size
          b(0x01, 0x00) // one 1-byte data sub-block
          b(0x00) // block terminator
        }
        b(0x3B)
      case 2 => // BMP: file header + BITMAPINFOHEADER, no pixel data
        s("BM"); le32(54); le32(0); le32(54)
        le32(40); le32(w); le32(h); le16(1); le16(24)
        le32(0); le32(0); le32(0); le32(0); le32(0); le32(0)
      case 3 => // JPEG: SOI + APP0(JFIF) + SOF0 (1 component) + EOI
        b(0xFF, 0xD8)
        b(0xFF, 0xE0); be16(16); s("JFIF"); b(0, 1, 1, 0)
        be16(1); be16(1); b(0, 0)
        b(0xFF, 0xC0); be16(11); b(8); be16(h); be16(w); b(1, 1, 0x11, 0)
        b(0xFF, 0xD9)
      case _ => // WAV: RIFF + fmt (PCM mono 16-bit) + data (zeros)
        val dataSize = 2 * frames
        s("RIFF"); le32(36 + dataSize); s("WAVE")
        s("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000)
        le16(2); le16(16)
        s("data"); le32(dataSize)
        out.write(new Array[Byte](dataSize), 0, dataSize)
    }
    out.toByteArray
  }

  /** A sampled frame reference with stub-resized dimensions. */
  case class FrameRef(media_id: Long, frame_idx: Int, rw: Int, rh: Int)

  /** Frame sampling + resize planning over binary media: every `every`-th
    * frame index up to `maxFrames` refs per media row (BOUNDED output —
    * a 10-hour video cannot explode into millions of rows), with
    * target-box resize dims computed by integer scaling (exact on any
    * engine: no floating-point rounding). Frame counts/dims come from
    * the REAL container headers (MEDIA-1); unknown magic falls back to
    * the stub. The pixel work itself (decode + actual resample) is the
    * documented codec stub — this op plans the distributed work
    * (schema, expansion bounds, partition shape), which is the
    * Spark-side contract.
    */
  def frameSample(spark: SparkSession, media: Dataset[MediaRow],
      every: Int = 2, maxFrames: Int = 8,
      target: Int = 64): Dataset[FrameRef] = {
    import spark.implicits._
    require(every > 0 && maxFrames > 0 && target > 0)
    media.mapPartitions { it =>
      it.flatMap { m =>
        val (w, h, frames) = parseContainerHeader(m.payload) match {
          case Some((_, pw, ph, pf)) => (pw, ph, pf)
          case None =>
            val (w0, h0, f0, _, _) = decodeStub(m.kind, m.payload)
            (w0, h0, f0)
        }
        // Long arithmetic + clamp: header-parsed dims are attacker-
        // controlled (w * target can wrap Int; u32 widths parse
        // negative) — hardened like the parsers themselves
        val wl = math.max(0L, w.toLong)
        val hl = math.max(0L, h.toLong)
        val mx = math.max(wl, hl)
        val (rw, rh) =
          if (mx <= 0L) (0, 0)
          else ((wl * target / mx).toInt, (hl * target / mx).toInt)
        (0 until frames by every).take(maxFrames)
          .map(i => FrameRef(m.media_id, i, rw, rh))
      }
    }
  }

  /** Stub-only feature pass: bypasses container detection and always
    * applies `decodeStub`. This is the entry point for fixtures whose
    * payloads are arbitrary bytes (e.g. document text) — with detection
    * enabled, a payload that HAPPENS to start with container magic
    * (say, a transcript discussing "GIF89a...") would parse as a real
    * container and diverge from a stub-mirroring oracle. Production
    * code uses `extractFeatures`.
    */
  def stubFeatures(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, frames, hash, emb) = decodeStub(m.kind, m.payload)
        MediaFeatures(m.media_id, m.kind, "unknown",
          m.payload.length.toLong, w, h, frames, hash, emb)
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
