package graft.ops

/** MEDIA-6: real baseline JPEG content decode with nothing but the JDK.
  *
  * The reference decodes every image format it touches through PIL
  * (vkit/element/image.py:326-361); rounds 4-5 closed BMP, compressed
  * PNG (Inflater) and GIF (spec LZW) the same "the JDK + the published
  * spec is enough" way, leaving JPEG as the last labeled stub. This
  * object closes it: a baseline sequential-DCT Huffman decoder built
  * from the public ITU T.81 spec — marker walk, DQT/DHT table parse,
  * canonical Huffman decode (spec F.2.2.3), byte-unstuffed bit reader,
  * restart-marker handling, dequantization and a frozen IDCT — plus a
  * spec-conformant grayscale ENCODER used only to synthesize fixtures.
  *
  * Content contract (identical to BMP/PNG/GIF): the decoded LUMA plane
  * — component 0, which IS Rec.601 luma in every JFIF YCbCr layout —
  * hashed FNV-1a over top-down row-major bytes, plus the 8 row-band
  * floor-mean embedding.
  *
  * Determinism of a lossy format: the DECODER is a pure function of
  * the bytes. DC-only blocks take an exact integer path
  * (((dc + 4) >> 3) + 128, round-half-up); general blocks use the
  * separable double-precision IDCT over a StrictMath-precomputed
  * cosine kernel with a fixed summation order — bit-reproducible on
  * every JVM (Java FP is always-strict since 17, JEP 306).
  *
  * The lossless fixture trick that gives a lossy format a
  * formula-exact DuckDB oracle: FDCT of a FLAT 8x8 block has DC =
  * 8*(g-128) and zero AC; with quant = 8 the quantized DC is exactly
  * g-128, and the decode side recovers exactly g. So flat-tile images
  * round-trip bit-exactly through a fully spec-conformant baseline
  * JPEG, and the oracle recomputes hash + bands from the tile formula
  * in pure integer SQL (synthJpegContent / t_media_jpeg). General
  * (nonzero-AC) encodes are cross-validated against ImageIO in
  * JpegSpec instead.
  *
  * MEDIA-7 extends the scope to PROGRESSIVE JPEG (SOF2, T.81 Annex G):
  * a per-block luma coefficient store accumulates across scans —
  * DC first/refinement (interleaved or single-component), AC
  * first/refinement with EOB-run semantics — and dequant + IDCT run
  * once at EOI. Chroma-only scans are skipped wholesale (their entropy
  * data carries nothing the luma contract needs; the marker walk
  * re-syncs byte-wise), so a 3-component progressive decode does no
  * chroma Huffman work at all. The flat-tile losslessness argument
  * carries over unchanged: the same quantized coefficients arrive,
  * scan script notwithstanding, so the progressive fixture family
  * shares the baseline formula oracle.
  *
  * Out-of-scope byte streams return None and fall back to the labeled
  * stub, never throw: arithmetic/lossless/hierarchical SOFn, 12-bit
  * precision, >3 components, multi-scan SEQUENTIAL files, and any
  * truncated or corrupt stream.
  */
object Jpeg {

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  @inline private def clamp(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** zigzag scan position k -> natural (row-major) coefficient index
    * (T.81 figure 5).
    */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ---- the published Annex K tables (spec constants) -----------------

  /** standard luminance quantization table, natural row-major order
    * (T.81 table K.1) — used by the textured (lossy) test fixtures.
    */
  val StdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val DcLumaBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = Array.tabulate(12)(identity)

  private val AcLumaBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcLumaVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)

  // ---- canonical Huffman (spec C.2 / F.2.2.3) ------------------------

  /** decode tables per T.81 F.2.2.3 (MINCODE/MAXCODE/VALPTR). */
  private final class HuffDecoder(
      val minCode: Array[Int], val maxCode: Array[Int],
      val valPtr: Array[Int], val vals: Array[Int]) {
    def decode(r: BitReader): Int = {
      var code = r.bit()
      var l = 1
      while (code > maxCode(l)) { // maxCode = -1 marks an empty length
        l += 1
        if (l > 16) { r.bad = true; return 0 }
        code = (code << 1) | r.bit()
      }
      vals(valPtr(l) + code - minCode(l))
    }
  }

  private object HuffDecoder {
    /** None on an invalid canonical spec (overfull code space). */
    def build(bits: Array[Int], vals: Array[Int]): Option[HuffDecoder] = {
      val minCode = new Array[Int](17)
      val maxCode = Array.fill(17)(-1)
      val valPtr = new Array[Int](17)
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        if (code > (1 << l)) return None // overfull prefix code
        code <<= 1
        l += 1
      }
      Some(new HuffDecoder(minCode, maxCode, valPtr, vals))
    }
  }

  /** canonical encode table: symbol -> (code, length) (spec C.2). */
  private final class HuffEncoder(bits: Array[Int], vals: Array[Int]) {
    val codes = new Array[Int](256)
    val sizes = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          codes(vals(k)) = code
          sizes(vals(k)) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  // ---- entropy-coded bit IO (byte stuffing per F.1.2.3) --------------

  /** MSB-first reader over entropy-coded data: FF00 unstuffs to a data
    * FF, FF-FF is marker fill, FF-other stops the stream (marker).
    * Requesting bits past a marker or the buffer sets `bad` — corrupt
    * streams fail closed instead of decoding garbage.
    */
  private final class BitReader(b: Array[Byte], private var p: Int) {
    private var acc = 0
    private var cnt = 0
    private var marker = -1
    var bad = false

    def bit(): Int = {
      if (cnt == 0) {
        var filled = false
        while (!filled) {
          if (marker >= 0 || p >= b.length) { bad = true; return 0 }
          val v = b(p) & 0xFF
          if (v != 0xFF) { p += 1; acc = v; filled = true }
          else if (p + 1 >= b.length) { bad = true; return 0 }
          else {
            val n = b(p + 1) & 0xFF
            if (n == 0) { p += 2; acc = 0xFF; filled = true }
            else if (n == 0xFF) p += 1 // fill byte before a marker
            else { marker = n; bad = true; return 0 }
          }
        }
        cnt = 8
      }
      cnt -= 1
      (acc >>> cnt) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** byte-align (drop pad bits) and consume the expected RSTm. */
    def expectRestart(m: Int): Boolean = {
      cnt = 0
      if (marker < 0) {
        while (p + 1 < b.length && (b(p) & 0xFF) == 0xFF &&
          (b(p + 1) & 0xFF) == 0xFF) p += 1 // fill bytes
        if (p + 1 < b.length && (b(p) & 0xFF) == 0xFF) {
          marker = b(p + 1) & 0xFF
          p += 2
        } else return false
      }
      if (marker == 0xD0 + m) { marker = -1; true } else false
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var cnt = 0
    def put(code: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** pad the final partial byte with 1-bits (spec F.1.2.3). */
    def flush(): Unit = if (cnt > 0) {
      val pad = 8 - cnt
      acc = (acc << pad) | ((1 << pad) - 1)
      out.write(acc & 0xFF)
      if ((acc & 0xFF) == 0xFF) out.write(0x00)
      acc = 0; cnt = 0
    }
  }

  // ---- DCT (frozen arithmetic, see object scaladoc) -------------------

  /** Cos(u)(x) = C(u) cos((2x+1)u pi / 16), C(0) = 1/sqrt(2) —
    * precomputed once with StrictMath for cross-JVM determinism.
    */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  /** coef: 64 DEQUANTIZED coefficients (natural order) -> out: 64
    * samples 0..255. DC-only blocks take the exact integer shortcut;
    * general blocks run the separable double IDCT in a fixed order.
    */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    var any = false
    var k = 1
    while (k < 64 && !any) { if (coef(k) != 0) any = true; k += 1 }
    if (!any) {
      // flat value = F(0,0)/8 + 128, round-half-up — exact integers
      val v = clamp(((coef(0) + 4) >> 3) + 128)
      java.util.Arrays.fill(out, v)
      return
    }
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // g(x, v) = 0.5 * sum_u Cos(u)(x) F(u, v)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Cos(u)(x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = 0.5 * s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) { // f(x, y) = 0.5 * sum_v Cos(v)(y) g(x, v)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += Cos(vv)(y) * tmp(vv * 8 + x); vv += 1 }
        out(y * 8 + x) = clamp(Math.round(0.5 * s).toInt + 128)
        x += 1
      }
      y += 1
    }
  }

  /** level-shifted FDCT + quantization (encoder side; double kernel,
    * fixed order — same determinism argument as idct).
    */
  private def fdctQuant(block: Array[Int], q: Array[Int],
      out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // G(u, y) = 0.5 * sum_x Cos(u)(x) (f(x,y) - 128)
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += Cos(u)(x) * (block(y * 8 + x) - 128); x += 1 }
        tmp(y * 8 + u) = 0.5 * s
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) { // F(u, v) = 0.5 * sum_y Cos(v)(y) G(u, y)
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += Cos(v)(yy) * tmp(yy * 8 + u); yy += 1 }
        out(v * 8 + u) = Math.round(0.5 * s / q(v * 8 + u)).toInt
        u += 1
      }
      v += 1
    }
  }

  // ---- decoder --------------------------------------------------------

  private final class Comp(
      val cid: Int, val h: Int, val v: Int, val tq: Int) {
    var td = 0
    var ta = 0
  }

  /** Decode to the luma plane: Some((w, h, top-down row-major luma
    * bytes)) or None (stub fallback) for anything outside the
    * MEDIA-6/7 scope or any corrupt/truncated stream. Accepts
    * SOF0/SOF1 (baseline/extended sequential, single interleaved
    * scan) and SOF2 (progressive: spectral selection + successive
    * approximation, T.81 Annex G) — 8-bit, 1 or 3 components with
    * component 0 at full sampling resolution, DRI/RSTn.
    */
  def decodeLuma(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
    var p = 2
    val qt = Array.ofDim[Int](4, 64)
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var w = 0
    var h = 0
    var comps: Array[Comp] = null
    var dri = 0
    // progressive (MEDIA-7) state: the luma coefficient store persists
    // across scans; lastAl tracks each coefficient's successive-
    // approximation history so out-of-order scan scripts fail closed
    var prog = false
    var hMax = 1
    var vMax = 1
    var lumaBW = 0
    var lumaBH = 0
    var progCoef: Array[Short] = null
    val lastAl = Array.fill(64)(-1)
    while (p + 2 <= b.length) {
      if (u8(b, p) != 0xFF) return None
      p += 1
      var m = u8(b, p)
      p += 1
      while (m == 0xFF && p < b.length) { m = u8(b, p); p += 1 } // fill
      // EOI closes a progressive file whose luma DC arrived (AC bands
      // never scanned stay zero, per Annex G); anywhere else: corrupt
      if (m == 0xD9)
        return if (prog && lastAl(0) >= 0 && qtSeen(comps(0).tq))
          finishProg(w, h, lumaBW, lumaBH, progCoef, qt(comps(0).tq))
        else None
      // stray RSTn/TEM or a second SOI: corrupt
      if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) return None
      if (p + 2 > b.length) return None
      val len = be16(b, p)
      if (len < 2 || p + len > b.length) return None
      val seg = p + 2
      val segEnd = p + len
      var resume = segEnd
      m match {
        case 0xDB => // DQT: one or more tables, 8- or 16-bit precision
          var q = seg
          while (q < segEnd) {
            val pq = u8(b, q) >> 4
            val tq = u8(b, q) & 15
            if (tq > 3 || pq > 1) return None
            if (pq == 0) {
              if (q + 65 > segEnd) return None
              var k = 0
              while (k < 64) {
                qt(tq)(Zigzag(k)) = u8(b, q + 1 + k); k += 1
              }
              q += 65
            } else {
              if (q + 129 > segEnd) return None
              var k = 0
              while (k < 64) {
                qt(tq)(Zigzag(k)) = be16(b, q + 1 + 2 * k); k += 1
              }
              q += 129
            }
            qtSeen(tq) = true
          }
        case 0xC4 => // DHT: one or more canonical tables
          var q = seg
          while (q < segEnd) {
            if (q + 17 > segEnd) return None
            val tc = u8(b, q) >> 4
            val th = u8(b, q) & 15
            if (tc > 1 || th > 3) return None
            val bits = Array.tabulate(16)(i => u8(b, q + 1 + i))
            val n = bits.sum
            if (n == 0 || n > 256 || q + 17 + n > segEnd) return None
            val vals = Array.tabulate(n)(i => u8(b, q + 17 + i))
            val dec = HuffDecoder.build(bits, vals).getOrElse(return None)
            if (tc == 0) dcTabs(th) = dec else acTabs(th) = dec
            q += 17 + n
          }
        case 0xC0 | 0xC1 | 0xC2 => // sequential (C0/C1) / progressive (C2)
          if (comps != null) return None
          if (len < 8 || u8(b, seg) != 8) return None // 8-bit only
          h = be16(b, seg + 1)
          w = be16(b, seg + 3)
          val nc = u8(b, seg + 5)
          // h == 0 defers height to a DNL marker — out of scope
          if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14))
            return None
          if ((nc != 1 && nc != 3) || len != 8 + 3 * nc) return None
          comps = Array.tabulate(nc) { i =>
            val o = seg + 6 + 3 * i
            new Comp(u8(b, o), u8(b, o + 1) >> 4, u8(b, o + 1) & 15,
              u8(b, o + 2))
          }
          var ci = 0
          while (ci < nc) {
            val c = comps(ci)
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3)
              return None
            ci += 1
          }
          if (m == 0xC2) {
            prog = true
            ci = 0
            while (ci < nc) {
              if (comps(ci).h > hMax) hMax = comps(ci).h
              if (comps(ci).v > vMax) vMax = comps(ci).v
              ci += 1
            }
            // the content contract is the luma plane: component 0 must
            // be the full-resolution one (true of every JFIF layout)
            if (comps(0).h != hMax || comps(0).v != vMax) return None
            // the coefficient store lives until EOI — tighter pixel cap
            // than baseline's streaming one-pass bound
            if (w.toLong * h > (1L << 24)) return None
            lumaBW = (w + 7) / 8
            lumaBH = (h + 7) / 8
            progCoef = new Array[Short](lumaBW * lumaBH * 64)
          }
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
            0xCD | 0xCE | 0xCF =>
          return None // lossless/differential/arithmetic: out of scope
        case 0xDD => // DRI
          if (len != 4) return None
          dri = be16(b, seg)
        case 0xDA => // SOS
          if (comps == null) return None
          if (!prog) { // sequential: single interleaved scan, then done
            val ns = u8(b, seg)
            if (ns != comps.length || len != 6 + 2 * ns) return None
            var i = 0
            while (i < ns) {
              if (u8(b, seg + 1 + 2 * i) != comps(i).cid) return None
              comps(i).td = u8(b, seg + 2 + 2 * i) >> 4
              comps(i).ta = u8(b, seg + 2 + 2 * i) & 15
              if (comps(i).td > 3 || comps(i).ta > 3) return None
              i += 1
            }
            // baseline spectral selection / approximation: 0, 63, 0
            if (u8(b, segEnd - 3) != 0 || u8(b, segEnd - 2) != 63 ||
              u8(b, segEnd - 1) != 0) return None
            return decodeScan(b, segEnd, w, h, comps, qt, qtSeen,
              dcTabs, acTabs, dri)
          }
          // progressive: decode (or skip) this scan, then carry on
          // walking markers — the entropy data ends at the next
          // non-RST marker regardless of what we decoded from it
          if (!progScan(b, seg, segEnd, len, w, h, comps, dcTabs,
            acTabs, dri, hMax, vMax, lumaBW, lumaBH, progCoef, lastAl))
            return None
          resume = nextMarkerPos(b, segEnd)
          if (resume < 0) return None
        case _ =>
          if ((m >= 0xE0 && m <= 0xEF) || m == 0xFE) () // APPn / COM
          else return None
      }
      p = resume
    }
    None
  }

  /** first position of a 0xFF that starts a real marker (not a stuffed
    * data byte, fill byte, or in-scan RSTn), or -1. How the marker walk
    * recovers segment framing after progressive entropy data.
    */
  private def nextMarkerPos(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p + 1 < b.length) {
      if (u8(b, p) != 0xFF) p += 1
      else {
        val n = u8(b, p + 1)
        if (n == 0x00) p += 2 // stuffed data FF
        else if (n == 0xFF) p += 1 // fill byte
        else if (n >= 0xD0 && n <= 0xD7) p += 2 // restart, inside scan
        else return p
      }
    }
    -1
  }

  /** one progressive scan (T.81 Annex G): validates the scan header
    * against the per-coefficient successive-approximation history,
    * then dispatches to the DC/AC first/refinement decoders. Scans not
    * touching component 0 are skipped wholesale — their entropy data
    * carries nothing the luma contract needs, and the marker walk
    * re-syncs byte-wise (nextMarkerPos).
    */
  private def progScan(b: Array[Byte], seg: Int, segEnd: Int, len: Int,
      w: Int, h: Int, comps: Array[Comp], dcTabs: Array[HuffDecoder],
      acTabs: Array[HuffDecoder], dri: Int, hMax: Int, vMax: Int,
      lumaBW: Int, lumaBH: Int, coefs: Array[Short],
      lastAl: Array[Int]): Boolean = {
    val ns = u8(b, seg)
    if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) return false
    val scomp = new Array[Int](ns)
    var i = 0
    while (i < ns) {
      val cid = u8(b, seg + 1 + 2 * i)
      var idx = -1
      var j = 0
      while (j < comps.length) { if (comps(j).cid == cid) idx = j; j += 1 }
      if (idx < 0) return false
      j = 0
      while (j < i) { if (scomp(j) == idx) return false; j += 1 }
      scomp(i) = idx
      comps(idx).td = u8(b, seg + 2 + 2 * i) >> 4
      comps(idx).ta = u8(b, seg + 2 + 2 * i) & 15
      if (comps(idx).td > 3 || comps(idx).ta > 3) return false
      i += 1
    }
    val ss = u8(b, segEnd - 3)
    val se = u8(b, segEnd - 2)
    val ah = u8(b, segEnd - 1) >> 4
    val al = u8(b, segEnd - 1) & 15
    if (se > 63 || ss > se || al > 13) return false
    if (ss == 0 && se != 0) return false // DC scans carry only coef 0
    if (ss > 0 && ns != 1) return false // AC scans are single-component
    if (ah != 0 && ah != al + 1) return false
    var hasLuma = false
    i = 0
    while (i < ns) { if (scomp(i) == 0) hasLuma = true; i += 1 }
    if (!hasLuma) return true // chroma-only: skip
    if (ss > 0 && lastAl(0) < 0) return false // AC before the DC scan
    var k = ss
    while (k <= se) { // per-coefficient approximation history
      if (ah == 0) { if (lastAl(k) >= 0) return false }
      else if (lastAl(k) != ah) return false
      k += 1
    }
    val ok =
      if (ss == 0)
        progDcScan(b, segEnd, w, h, comps, scomp, dcTabs, ah, al, dri,
          hMax, vMax, lumaBW, lumaBH, coefs)
      else if (ah == 0)
        progAcFirst(b, segEnd, acTabs(comps(0).ta), ss, se, al, dri,
          lumaBW * lumaBH, coefs)
      else
        progAcRefine(b, segEnd, acTabs(comps(0).ta), ss, se, al, dri,
          lumaBW * lumaBH, coefs)
    if (!ok) return false
    k = ss
    while (k <= se) { lastAl(k) = al; k += 1 }
    true
  }

  /** progressive DC scan, interleaved or single-component: the first
    * pass (Ah=0) decodes DC diffs into pred<<Al; refinements append
    * one bit<<Al per block. Non-luma components are entropy-decoded
    * for stream position only.
    */
  private def progDcScan(b: Array[Byte], start: Int, w: Int, h: Int,
      comps: Array[Comp], scomp: Array[Int],
      dcTabs: Array[HuffDecoder], ah: Int, al: Int, dri: Int,
      hMax: Int, vMax: Int, lumaBW: Int, lumaBH: Int,
      coefs: Array[Short]): Boolean = {
    val r = new BitReader(b, start)
    val ns = scomp.length
    var i = 0
    while (i < ns) {
      if (ah == 0 && dcTabs(comps(scomp(i)).td) == null) return false
      i += 1
    }
    val pred = new Array[Int](comps.length)
    // single-component scans are NOT MCU-tiled (T.81 A.2.2): the MCU
    // is one data unit over that component's own block grid
    val single = ns == 1
    val c0idx = scomp(0)
    val bw0 =
      if (single) (w * comps(c0idx).h + 8 * hMax - 1) / (8 * hMax)
      else (w + 8 * hMax - 1) / (8 * hMax)
    val bh0 =
      if (single) (h * comps(c0idx).v + 8 * vMax - 1) / (8 * vMax)
      else (h + 8 * vMax - 1) / (8 * vMax)
    val blocks: Array[(Int, Int, Int)] =
      if (single) Array((c0idx, 0, 0))
      else (for {
        i2 <- 0 until ns
        vv <- 0 until comps(scomp(i2)).v
        hh <- 0 until comps(scomp(i2)).h
      } yield (scomp(i2), hh, vv)).toArray
    val nMcus = bw0 * bh0
    var mcu = 0
    var rst = 0
    while (mcu < nMcus) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        if (!r.expectRestart(rst & 7)) return false
        rst += 1
        java.util.Arrays.fill(pred, 0)
      }
      val mcuX = mcu % bw0
      val mcuY = mcu / bw0
      var bi = 0
      while (bi < blocks.length) {
        val (ci, bh, bv) = blocks(bi)
        var dcBit = 0
        if (ah == 0) {
          val s = dcTabs(comps(ci).td).decode(r)
          if (r.bad || s > 15) return false
          val diff = if (s == 0) 0 else extend(r.bits(s), s)
          if (r.bad) return false
          pred(ci) += diff
        } else {
          dcBit = r.bit()
          if (r.bad) return false
        }
        if (ci == 0) {
          val bx = if (single) mcuX else mcuX * comps(0).h + bh
          val by = if (single) mcuY else mcuY * comps(0).v + bv
          if (bx < lumaBW && by < lumaBH) { // MCU-grid padding blocks
            val at = (by * lumaBW + bx) * 64
            if (ah == 0) coefs(at) = (pred(0) << al).toShort
            else coefs(at) = (coefs(at) | (dcBit << al)).toShort
          }
        }
        bi += 1
      }
      mcu += 1
    }
    !r.bad
  }

  /** progressive AC first scan (G.1.2.2) over the luma block grid:
    * run-length coefficients at precision Al, with EOBn runs spanning
    * blocks. Restart intervals reset the EOB run.
    */
  private def progAcFirst(b: Array[Byte], start: Int,
      ac: HuffDecoder, ss: Int, se: Int, al: Int, dri: Int,
      nBlocks: Int, coefs: Array[Short]): Boolean = {
    if (ac == null) return false
    val r = new BitReader(b, start)
    var eobrun = 0
    var blk = 0
    var rst = 0
    while (blk < nBlocks) {
      if (dri > 0 && blk > 0 && blk % dri == 0) {
        if (!r.expectRestart(rst & 7)) return false
        rst += 1
        eobrun = 0
      }
      if (eobrun > 0) eobrun -= 1
      else {
        val base = blk * 64
        var k = ss
        var done = false
        while (!done && k <= se) {
          val rs = ac.decode(r)
          if (r.bad) return false
          val run = rs >> 4
          val size = rs & 15
          if (size == 0) {
            if (run == 15) k += 16 // ZRL
            else { // EOBn: this block ends; run-1+extra more follow
              eobrun = (1 << run) - 1 +
                (if (run > 0) r.bits(run) else 0)
              done = true
            }
          } else {
            k += run
            if (k > se) return false
            coefs(base + Zigzag(k)) =
              (extend(r.bits(size), size) << al).toShort
            k += 1
          }
          if (r.bad) return false
        }
      }
      blk += 1
    }
    !r.bad
  }

  /** progressive AC refinement scan (G.1.2.3) over the luma block
    * grid: adds one magnitude bit to already-nonzero coefficients
    * (correction bits) and places newly-nonzero ones at +-1<<Al.
    * EOB-run blocks still consume correction bits for their nonzero
    * history — the part naive implementations get wrong.
    */
  private def progAcRefine(b: Array[Byte], start: Int,
      ac: HuffDecoder, ss: Int, se: Int, al: Int, dri: Int,
      nBlocks: Int, coefs: Array[Short]): Boolean = {
    if (ac == null) return false
    val r = new BitReader(b, start)
    val p1 = 1 << al
    var eobrun = 0
    var blk = 0
    var rst = 0
    while (blk < nBlocks) {
      if (dri > 0 && blk > 0 && blk % dri == 0) {
        if (!r.expectRestart(rst & 7)) return false
        rst += 1
        eobrun = 0
      }
      val base = blk * 64
      var k = ss
      if (eobrun == 0) {
        var brk = false
        while (!brk && k <= se) {
          val rs = ac.decode(r)
          if (r.bad) return false
          var run = rs >> 4
          val size = rs & 15
          var newVal = 0
          if (size == 0) {
            if (run != 15) { // EOBn; correction bits below, then skip
              eobrun = (1 << run) + (if (run > 0) r.bits(run) else 0)
              if (r.bad) return false
              brk = true
            }
            // run == 15 (ZRL): pass 16 zero-history coefficients
          } else {
            if (size != 1) return false // refinement sends 1-bit sizes
            newVal = if (r.bit() == 1) p1 else -p1
            if (r.bad) return false
          }
          if (!brk) {
            // advance over `run` zero-history coefficients, appending
            // correction bits to nonzero ones passed on the way
            var placed = false
            while (!placed && k <= se) {
              val ce = base + Zigzag(k)
              if (coefs(ce) != 0) {
                val bit = r.bit()
                if (r.bad) return false
                if (bit == 1 && (coefs(ce) & p1) == 0)
                  coefs(ce) = (coefs(ce) +
                    (if (coefs(ce) >= 0) p1 else -p1)).toShort
              } else {
                if (run == 0) {
                  if (newVal != 0) coefs(ce) = newVal.toShort
                  placed = true
                } else run -= 1
              }
              k += 1
            }
            if (!placed && newVal != 0) return false // band overrun
          }
        }
      }
      if (eobrun > 0) {
        // end-of-band: remaining nonzero history still gets bits
        while (k <= se) {
          val ce = base + Zigzag(k)
          if (coefs(ce) != 0) {
            val bit = r.bit()
            if (r.bad) return false
            if (bit == 1 && (coefs(ce) & p1) == 0)
              coefs(ce) = (coefs(ce) +
                (if (coefs(ce) >= 0) p1 else -p1)).toShort
          }
          k += 1
        }
        eobrun -= 1
      }
      blk += 1
    }
    !r.bad
  }

  /** EOI of a progressive stream: dequantize the accumulated luma
    * coefficients and IDCT block-wise into the final plane.
    */
  private def finishProg(w: Int, h: Int, lumaBW: Int, lumaBH: Int,
      coefs: Array[Short], q: Array[Int])
      : Option[(Int, Int, Array[Byte])] = {
    val out = new Array[Byte](w * h)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var by = 0
    while (by < lumaBH) {
      var bx = 0
      while (bx < lumaBW) {
        val base = (by * lumaBW + bx) * 64
        var k = 0
        while (k < 64) { coef(k) = coefs(base + k) * q(k); k += 1 }
        idct(coef, px)
        val x0 = bx * 8
        val y0 = by * 8
        val xm = math.min(8, w - x0)
        val ym = math.min(8, h - y0)
        var yy = 0
        while (yy < ym) {
          val row = (y0 + yy) * w + x0
          var xx = 0
          while (xx < xm) { out(row + xx) = px(yy * 8 + xx).toByte; xx += 1 }
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
    Some((w, h, out))
  }

  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int,
      comps: Array[Comp], qt: Array[Array[Int]], qtSeen: Array[Boolean],
      dcTabs: Array[HuffDecoder], acTabs: Array[HuffDecoder], dri: Int)
      : Option[(Int, Int, Array[Byte])] = {
    val nc = comps.length
    var hMax = 1
    var vMax = 1
    var ci = 0
    while (ci < nc) {
      if (comps(ci).h > hMax) hMax = comps(ci).h
      if (comps(ci).v > vMax) vMax = comps(ci).v
      ci += 1
    }
    // the content contract is the LUMA plane: component 0 must be the
    // full-resolution one (true of every JFIF YCbCr layout)
    if (comps(0).h != hMax || comps(0).v != vMax) return None
    ci = 0
    while (ci < nc) {
      val c = comps(ci)
      if (!qtSeen(c.tq) || dcTabs(c.td) == null || acTabs(c.ta) == null)
        return None
      ci += 1
    }
    // MCU geometry; a single-component scan's MCU is ONE data unit
    // (T.81 A.2.2/A.2.3), so Hi/Vi do not tile it
    val mcusX = if (nc == 1) (w + 7) / 8 else (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = if (nc == 1) (h + 7) / 8 else (h + 8 * vMax - 1) / (8 * vMax)
    val blocks: Array[(Int, Int, Int)] = // (comp, hOff, vOff) per MCU
      if (nc == 1) Array((0, 0, 0))
      else (for {
        i <- 0 until nc
        vv <- 0 until comps(i).v
        hh <- 0 until comps(i).h
      } yield (i, hh, vv)).toArray
    val planeW = if (nc == 1) mcusX * 8 else mcusX * hMax * 8
    val planeH = if (nc == 1) mcusY * 8 else mcusY * vMax * 8
    if (planeW.toLong * planeH > (1L << 26)) return None
    val plane = new Array[Byte](planeW * planeH)
    val reader = new BitReader(b, start)
    val pred = new Array[Int](nc)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    val nMcus = mcusX * mcusY
    var mcu = 0
    var rst = 0
    while (mcu < nMcus) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        if (!reader.expectRestart(rst & 7)) return None
        rst += 1
        java.util.Arrays.fill(pred, 0)
      }
      val mcuX = mcu % mcusX
      val mcuY = mcu / mcusX
      var bi = 0
      while (bi < blocks.length) {
        val (bc, bh, bv) = blocks(bi)
        val c = comps(bc)
        if (!decodeBlock(reader, dcTabs(c.td), acTabs(c.ta), qt(c.tq),
          pred, bc, coef)) return None
        if (bc == 0) { // chroma blocks advance the stream, luma lands
          idct(coef, px)
          val x0 = if (nc == 1) mcuX * 8 else (mcuX * hMax + bh) * 8
          val y0 = if (nc == 1) mcuY * 8 else (mcuY * vMax + bv) * 8
          var yy = 0
          while (yy < 8) {
            val rowOff = (y0 + yy) * planeW + x0
            var xx = 0
            while (xx < 8) {
              plane(rowOff + xx) = px(yy * 8 + xx).toByte
              xx += 1
            }
            yy += 1
          }
        }
        bi += 1
      }
      if (reader.bad) return None
      mcu += 1
    }
    if (planeW == w && planeH == h) return Some((w, h, plane))
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(plane, y * planeW, out, y * w, w)
      y += 1
    }
    Some((w, h, out))
  }

  /** one data unit: DC diff (F.2.2.1) + AC run-length (F.2.2.2),
    * dequantized into `coef` (natural order).
    */
  private def decodeBlock(r: BitReader, dc: HuffDecoder, ac: HuffDecoder,
      q: Array[Int], pred: Array[Int], ci: Int,
      coef: Array[Int]): Boolean = {
    java.util.Arrays.fill(coef, 0)
    val s = dc.decode(r)
    if (r.bad || s > 15) return false
    val diff = if (s == 0) 0 else extend(r.bits(s), s)
    if (r.bad) return false
    pred(ci) += diff
    coef(0) = pred(ci) * q(0)
    var k = 1
    var done = false
    while (!done && k < 64) {
      val rs = ac.decode(r)
      if (r.bad) return false
      val run = rs >> 4
      val size = rs & 15
      if (size == 0) {
        if (run == 15) k += 16 // ZRL
        else done = true // EOB
      } else {
        k += run
        if (k > 63) return false
        val zz = Zigzag(k)
        coef(zz) = extend(r.bits(size), size) * q(zz)
        k += 1
      }
      if (r.bad) return false
    }
    true
  }

  /** EXTEND (spec F.2.2.1): map s received bits to a signed value. */
  @inline private def extend(v: Int, s: Int): Int =
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** MEDIA-6 content contract: luma plane -> (FNV-1a hash, 8 row-band
    * floor-mean embedding) — identical to the BMP/PNG/GIF fold.
    */
  def decodeContent(b: Array[Byte]): Option[(Long, Seq[Float])] =
    decodeLuma(b).map { case (w, h, plane) =>
      var hash = 0xCBF29CE484222325L
      val sums = new Array[Long](8)
      val cnts = new Array[Long](8)
      var y = 0
      while (y < h) {
        val band = (y.toLong * 8 / h).toInt
        var x = 0
        while (x < w) {
          val l = plane(y * w + x) & 0xFF
          hash ^= l
          hash *= 0x100000001B3L
          sums(band) += l
          cnts(band) += 1
          x += 1
        }
        y += 1
      }
      (hash, (0 until 8).map(d =>
        if (cnts(d) == 0) 0f else (sums(d) / cnts(d)).toFloat))
    }

  // ---- encoder (fixture synthesis only) -------------------------------

  /** spec-conformant baseline grayscale encoder: JFIF APP0, DQT (the
    * given natural-order table), SOF0 (8-bit, 1 component), the Annex
    * K luma Huffman pair, optional DRI/RSTn, edge-replicated partial
    * blocks, byte-stuffed entropy data, 1-padded final byte.
    */
  def encodeGray(w: Int, h: Int, pix: (Int, Int) => Int,
      quant: Array[Int], dri: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, "encodeGray: empty image")
    val out = new java.io.ByteArrayOutputStream()
    def b2(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xFF))
    def be16o(v: Int): Unit = b2(v >>> 8, v)
    b2(0xFF, 0xD8) // SOI
    b2(0xFF, 0xE0); be16o(16) // APP0 JFIF
    "JFIF".foreach(c => out.write(c.toInt)); b2(0, 1, 1, 0)
    be16o(1); be16o(1); b2(0, 0)
    b2(0xFF, 0xDB); be16o(67); b2(0) // DQT (zigzag on the wire)
    var k = 0
    while (k < 64) { out.write(quant(Zigzag(k)) & 0xFF); k += 1 }
    b2(0xFF, 0xC0); be16o(11); b2(8) // SOF0
    be16o(h); be16o(w); b2(1, 1, 0x11, 0)
    def dht(tcth: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      b2(0xFF, 0xC4); be16o(2 + 1 + 16 + vals.length); b2(tcth)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0x00, DcLumaBits, DcLumaVals)
    dht(0x10, AcLumaBits, AcLumaVals)
    if (dri > 0) { b2(0xFF, 0xDD); be16o(4); be16o(dri) }
    b2(0xFF, 0xDA); be16o(8); b2(1, 1, 0x00, 0, 63, 0) // SOS
    val dcEnc = new HuffEncoder(DcLumaBits, DcLumaVals)
    val acEnc = new HuffEncoder(AcLumaBits, AcLumaVals)
    val bw = new BitWriter(out)
    val block = new Array[Int](64)
    val coef = new Array[Int](64)
    val bxs = (w + 7) / 8
    val bys = (h + 7) / 8
    var pred = 0
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < bys) {
      var bx = 0
      while (bx < bxs) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          bw.flush()
          b2(0xFF, 0xD0 + (rst & 7))
          rst += 1
          pred = 0
        }
        var yy = 0
        while (yy < 8) {
          val sy = math.min(by * 8 + yy, h - 1)
          var xx = 0
          while (xx < 8) {
            val sx = math.min(bx * 8 + xx, w - 1)
            block(yy * 8 + xx) = pix(sx, sy) & 0xFF
            xx += 1
          }
          yy += 1
        }
        fdctQuant(block, quant, coef)
        val diff = coef(0) - pred
        pred = coef(0)
        val s = magnitudeCat(diff)
        bw.put(dcEnc.codes(s), dcEnc.sizes(s))
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        var kk = 1
        var run = 0
        while (kk < 64) {
          val v = coef(Zigzag(kk))
          if (v == 0) run += 1
          else {
            while (run >= 16) {
              bw.put(acEnc.codes(0xF0), acEnc.sizes(0xF0)); run -= 16
            }
            val sz = magnitudeCat(v)
            bw.put(acEnc.codes((run << 4) | sz), acEnc.sizes((run << 4) | sz))
            bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
            run = 0
          }
          kk += 1
        }
        if (run > 0) bw.put(acEnc.codes(0x00), acEnc.sizes(0x00)) // EOB
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    b2(0xFF, 0xD9) // EOI
    out.toByteArray
  }

  @inline private def magnitudeCat(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** fixture-only progressive AC table: Annex K's baseline AC table has
    * no EOBn symbols (progressive encoders ship custom tables), so the
    * progressive fixture encoder uses this flat canonical table — every
    * needed symbol at 8 bits: EOBn r=0..14, ZRL, and sizes 1..10 at
    * runs 0..15 (176 symbols; the all-ones code stays unused, per C.2).
    */
  private val ProgAcVals: Array[Int] =
    ((0 to 14).map(r => r << 4) ++ Seq(0xF0) ++
      (for { run <- 0 to 15; s <- 1 to 10 } yield (run << 4) | s)).toArray
  private val ProgAcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, ProgAcVals.length, 0, 0, 0, 0, 0, 0, 0, 0)

  /** spec-conformant PROGRESSIVE grayscale encoder (fixture synthesis
    * only): same headers as encodeGray but SOF2, followed by the scan
    * script DC-first(Al=1) -> DC-refine -> AC 1..63 first(Al=acAl)
    * [-> AC refinements down to Al=0]. With acAl > 0 the refinement
    * scans are emitted only for all-zero-AC content (the flat fixture
    * family — they reduce to pure EOB runs); general content must use
    * acAl = 0, where one first scan carries full precision.
    */
  def encodeGrayProg(w: Int, h: Int, pix: (Int, Int) => Int,
      quant: Array[Int], acAl: Int = 0, dri: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, "encodeGrayProg: empty image")
    val out = new java.io.ByteArrayOutputStream()
    def b2(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xFF))
    def be16o(v: Int): Unit = b2(v >>> 8, v)
    b2(0xFF, 0xD8) // SOI
    b2(0xFF, 0xE0); be16o(16) // APP0 JFIF
    "JFIF".foreach(c => out.write(c.toInt)); b2(0, 1, 1, 0)
    be16o(1); be16o(1); b2(0, 0)
    b2(0xFF, 0xDB); be16o(67); b2(0) // DQT (zigzag on the wire)
    var k = 0
    while (k < 64) { out.write(quant(Zigzag(k)) & 0xFF); k += 1 }
    b2(0xFF, 0xC2); be16o(11); b2(8) // SOF2
    be16o(h); be16o(w); b2(1, 1, 0x11, 0)
    def dht(tcth: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      b2(0xFF, 0xC4); be16o(2 + 1 + 16 + vals.length); b2(tcth)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0x00, DcLumaBits, DcLumaVals)
    dht(0x10, ProgAcBits, ProgAcVals)
    if (dri > 0) { b2(0xFF, 0xDD); be16o(4); be16o(dri) }
    // quantized coefficients of every block, computed once up front
    val bxs = (w + 7) / 8
    val bys = (h + 7) / 8
    val nB = bxs * bys
    val allCoef = new Array[Int](nB * 64)
    locally {
      val block = new Array[Int](64)
      val coef = new Array[Int](64)
      var blk = 0
      var by = 0
      while (by < bys) {
        var bx = 0
        while (bx < bxs) {
          var yy = 0
          while (yy < 8) {
            val sy = math.min(by * 8 + yy, h - 1)
            var xx = 0
            while (xx < 8) {
              val sx = math.min(bx * 8 + xx, w - 1)
              block(yy * 8 + xx) = pix(sx, sy) & 0xFF
              xx += 1
            }
            yy += 1
          }
          fdctQuant(block, quant, coef)
          System.arraycopy(coef, 0, allCoef, blk * 64, 64)
          blk += 1
          bx += 1
        }
        by += 1
      }
    }
    val dcEnc = new HuffEncoder(DcLumaBits, DcLumaVals)
    val acEnc = new HuffEncoder(ProgAcBits, ProgAcVals)
    def sos(ssV: Int, seV: Int, ahV: Int, alV: Int): Unit = {
      b2(0xFF, 0xDA); be16o(8); b2(1, 1, 0x00, ssV, seV, (ahV << 4) | alV)
    }
    // scan 1: DC first, point transform >> 1
    sos(0, 0, 0, 1)
    locally {
      val bw = new BitWriter(out)
      var pred = 0
      var rst = 0
      var i = 0
      while (i < nB) {
        if (dri > 0 && i > 0 && i % dri == 0) {
          bw.flush(); b2(0xFF, 0xD0 + (rst & 7)); rst += 1; pred = 0
        }
        val v = allCoef(i * 64) >> 1 // arithmetic shift per G.1.2.1
        val diff = v - pred
        pred = v
        val s = magnitudeCat(diff)
        bw.put(dcEnc.codes(s), dcEnc.sizes(s))
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        i += 1
      }
      bw.flush()
    }
    // scan 2: DC refinement, the dropped low bit
    sos(0, 0, 1, 0)
    locally {
      val bw = new BitWriter(out)
      var rst = 0
      var i = 0
      while (i < nB) {
        if (dri > 0 && i > 0 && i % dri == 0) {
          bw.flush(); b2(0xFF, 0xD0 + (rst & 7)); rst += 1
        }
        bw.put(allCoef(i * 64) & 1, 1)
        i += 1
      }
      bw.flush()
    }
    // scan 3: AC first over the whole band at precision acAl
    sos(1, 63, 0, acAl)
    locally {
      val bw = new BitWriter(out)
      var eob = 0
      def flushEob(): Unit = if (eob > 0) {
        val r = 31 - Integer.numberOfLeadingZeros(eob)
        bw.put(acEnc.codes(r << 4), acEnc.sizes(r << 4))
        if (r > 0) bw.put(eob - (1 << r), r)
        eob = 0
      }
      var rst = 0
      var i = 0
      while (i < nB) {
        if (dri > 0 && i > 0 && i % dri == 0) {
          flushEob(); bw.flush(); b2(0xFF, 0xD0 + (rst & 7)); rst += 1
        }
        var run = 0
        var wrote = false
        var k2 = 1
        while (k2 < 64) {
          val v0 = allCoef(i * 64 + Zigzag(k2))
          val t = if (v0 >= 0) v0 >> acAl else -((-v0) >> acAl)
          if (t == 0) run += 1
          else {
            flushEob() // the EOB run of preceding blocks ends here
            while (run >= 16) {
              bw.put(acEnc.codes(0xF0), acEnc.sizes(0xF0)); run -= 16
            }
            val sz = magnitudeCat(t)
            require(sz <= 10 && run <= 15,
              "encodeGrayProg: coefficient outside the fixture table")
            bw.put(acEnc.codes((run << 4) | sz), acEnc.sizes((run << 4) | sz))
            bw.put(if (t < 0) t + (1 << sz) - 1 else t, sz)
            run = 0
            wrote = true
          }
          k2 += 1
        }
        if (run > 0 || !wrote) { eob += 1; if (eob == 32767) flushEob() }
        i += 1
      }
      flushEob()
      bw.flush()
    }
    // refinement scans (flat family only: pure EOB runs, no bits)
    var a = acAl
    while (a > 0) {
      sos(1, 63, a, a - 1)
      val bw = new BitWriter(out)
      var eob = 0
      def flushEob(): Unit = if (eob > 0) {
        val r = 31 - Integer.numberOfLeadingZeros(eob)
        bw.put(acEnc.codes(r << 4), acEnc.sizes(r << 4))
        if (r > 0) bw.put(eob - (1 << r), r)
        eob = 0
      }
      var rst = 0
      var i = 0
      while (i < nB) {
        if (dri > 0 && i > 0 && i % dri == 0) {
          flushEob(); bw.flush(); b2(0xFF, 0xD0 + (rst & 7)); rst += 1
        }
        var k2 = 1
        while (k2 < 64) {
          require(allCoef(i * 64 + Zigzag(k2)) == 0,
            "encodeGrayProg: acAl > 0 supports only all-zero-AC content")
          k2 += 1
        }
        eob += 1
        if (eob == 32767) flushEob()
        i += 1
      }
      flushEob()
      bw.flush()
      a -= 1
    }
    b2(0xFF, 0xD9) // EOI
    out.toByteArray
  }

  // ---- deterministic fixture synthesis (tests/oracles) ----------------

  def synthJpegDims(id: Long): (Int, Int) =
    ((8 + (id * 5) % 29).toInt, (8 + (id * 3) % 23).toInt)

  /** per-8x8-tile flat luma — the nonlinear cross term keeps band
    * means id-discriminative (the synthContentPixel precedent).
    */
  def tileLuma(id: Long, bx: Int, by: Int): Int =
    ((id * 11 + 23L * bx + 41L * by +
      (id % 89 + 1) * (bx + 2) * (by + 3)) % 256).toInt

  /** flat-tile grayscale baseline JPEG, quant all-8s: every block is
    * DC-only with quantized DC exactly g-128, so the file decodes
    * bit-exactly back to the tile formula (see object scaladoc) and
    * the t_media_jpeg oracle recomputes hash + bands in integer SQL.
    * Every 3rd id carries a restart interval (DRI=2) so the RSTn path
    * is driver-gated, not just unit-tested.
    */
  def synthJpegContent(id: Long): Array[Byte] = {
    val (w, h) = synthJpegDims(id)
    encodeGray(w, h, (x, y) => tileLuma(id, x / 8, y / 8),
      Array.fill(64)(8), dri = if (id % 3 == 0) 2 else 0)
  }

  /** progressive (SOF2) twin of synthJpegContent: the same flat tiles
    * and quant-8 losslessness, coded across multiple scans — DC
    * successive approximation (Al=1 then the refinement bit), the AC
    * band as EOBn runs, and for odd ids an extra AC approximation pair
    * exercising the refinement EOB-run path; every 3rd id restarts
    * (DRI=2). Decodes bit-identically to the baseline twin, so
    * t_media_jpeg_prog shares the formula oracle.
    */
  def synthJpegProgContent(id: Long): Array[Byte] = {
    val (w, h) = synthJpegDims(id)
    encodeGrayProg(w, h, (x, y) => tileLuma(id, x / 8, y / 8),
      Array.fill(64)(8), acAl = if (id % 2 == 1) 1 else 0,
      dri = if (id % 3 == 0) 2 else 0)
  }

  /** the same flat pixels as an uncompressed 24-bit BMP (r=g=b=g, so
    * integer luma is exactly g): the cross-format twin proving the
    * JPEG decode lands the identical content hash (t_media_jpeg_cross).
    */
  def synthJpegTwinBmp(id: Long): Array[Byte] = {
    val (w, h) = synthJpegDims(id)
    val rowSize = ((3 * w + 3) / 4) * 4
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xFF))
    def s(str: String): Unit = str.foreach(c => out.write(c.toInt))
    def le16(v: Int): Unit = b(v, v >>> 8)
    def le32(v: Int): Unit = b(v, v >>> 8, v >>> 16, v >>> 24)
    s("BM"); le32(54 + rowSize * h); le32(0); le32(54)
    le32(40); le32(w); le32(h); le16(1); le16(24)
    le32(0); le32(rowSize * h); le32(0); le32(0); le32(0); le32(0)
    var fy = 0
    while (fy < h) {
      val y = h - 1 - fy // bottom-up rows
      var x = 0
      while (x < w) {
        val g = tileLuma(id, x / 8, y / 8)
        b(g, g, g)
        x += 1
      }
      var pad = 3 * w
      while (pad < rowSize) { b(0); pad += 1 }
      fy += 1
    }
    out.toByteArray
  }

  /** general-content (nonzero-AC) grayscale JPEG at the standard Annex
    * K quant table — the LOSSY family, cross-validated decoder-vs-
    * ImageIO in JpegSpec (no formula oracle exists for it, by nature).
    */
  def synthTexturedJpeg(id: Long): Array[Byte] = {
    val (w, h) = synthJpegDims(id)
    encodeGray(w, h, (x, y) =>
      ((id * 7 + x * 13 + y * 31 + ((x * y) % 17) * 11) % 256).toInt,
      StdLumaQuant, dri = if (id % 4 == 0) 3 else 0)
  }
}
