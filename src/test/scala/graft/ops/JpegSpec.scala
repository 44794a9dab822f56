package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** MEDIA-6 validation battery: formula-exact round trip of the flat
  * (DC-only, quant-8) fixture family, ImageIO cross-validation of both
  * the lossless and the lossy (AC-bearing) families, a real-world-
  * encoder cross-check (the JDK's own JPEG WRITER produces 3-component
  * 4:2:0 files our decoder must read), and the hostile-byte battery
  * every media decoder in this repo carries.
  */
class JpegSpec extends AnyFunSuite {

  private def expectedLuma(id: Long): (Int, Int, Array[Int]) = {
    val (w, h) = Jpeg.synthJpegDims(id)
    val px = Array.tabulate(w * h)(i =>
      Jpeg.tileLuma(id, (i % w) / 8, (i / w) / 8))
    (w, h, px)
  }

  test("flat fixtures decode bit-exactly back to the tile formula") {
    for (id <- 0L until 300L) {
      val (w, h, exp) = expectedLuma(id)
      val got = Jpeg.decodeLuma(Jpeg.synthJpegContent(id))
      assert(got.isDefined, s"id=$id undecoded")
      val (gw, gh, plane) = got.get
      assert((gw, gh) == (w, h), s"id=$id dims")
      assert(plane.map(_ & 0xFF).toSeq == exp.toSeq, s"id=$id pixels")
    }
  }

  test("decodeContent matches the shared hash/band contract formulas") {
    for (id <- 0L until 100L) {
      val (w, h, px) = expectedLuma(id)
      var hash = 0xCBF29CE484222325L
      val sums = new Array[Long](8)
      val cnts = new Array[Long](8)
      for (i <- 0 until w * h) {
        hash ^= px(i)
        hash *= 0x100000001B3L
        val band = ((i / w).toLong * 8 / h).toInt
        sums(band) += px(i)
        cnts(band) += 1
      }
      val bands = (0 until 8).map(d =>
        if (cnts(d) == 0) 0f else (sums(d) / cnts(d)).toFloat)
      val got = Jpeg.decodeContent(Jpeg.synthJpegContent(id))
      assert(got.isDefined, s"id=$id")
      assert(got.get._1 == hash, s"id=$id hash")
      assert(got.get._2 == bands, s"id=$id bands")
    }
  }

  test("ImageIO agrees EXACTLY on the lossless flat family") {
    // quant-8 DC-only blocks have an implementation-independent
    // decode (dequantized DC divisible by 8), so libjpeg-backed
    // ImageIO must land the identical pixels — a full second decoder
    // confirming our Huffman/marker/restart handling end to end
    for (id <- 0L until 60L) {
      val bytes = Jpeg.synthJpegContent(id)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"id=$id ImageIO rejected the stream")
      val (w, h, plane) = Jpeg.decodeLuma(bytes).get
      assert((img.getWidth, img.getHeight) == (w, h), s"id=$id dims")
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w) {
        val ours = plane(y * w + x) & 0xFF
        val theirs = raster.getSample(x, y, 0)
        assert(ours == theirs, s"id=$id ($x,$y): $ours vs $theirs")
      }
    }
  }

  test("ImageIO agrees within +-1 on the lossy textured family") {
    // AC-bearing blocks: the IDCT is implementation-defined within
    // accuracy bounds, so exactness is not required — but both
    // decoders consume the same coefficients, so they must agree to
    // IDCT rounding (+-1)
    for (id <- 0L until 60L) {
      val bytes = Jpeg.synthTexturedJpeg(id)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"id=$id ImageIO rejected the stream")
      val (w, h, plane) = Jpeg.decodeLuma(bytes).get
      assert((img.getWidth, img.getHeight) == (w, h), s"id=$id dims")
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w) {
        val ours = plane(y * w + x) & 0xFF
        val theirs = raster.getSample(x, y, 0)
        assert(math.abs(ours - theirs) <= 1,
          s"id=$id ($x,$y): $ours vs $theirs")
      }
    }
  }

  test("decodes the JDK encoder's own 3-component 4:2:0 output") {
    // ImageIO WRITES interleaved YCbCr with subsampling — exactly the
    // multi-component MCU layout a web crawl serves; our luma plane
    // must track Rec.601 luma recovered from ImageIO's decoded RGB
    val w = 40
    val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // near-gray content: saturated chroma would clamp in the
    // YCbCr -> RGB stage and make Y unrecoverable from RGB — the
    // comparison below inverts ImageIO's RGB back to luma
    for (y <- 0 until h; x <- 0 until w) {
      val v = x * 4 + y * 3 // smooth gradient, no wrap (max 225)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", buf))
    val bytes = buf.toByteArray
    val got = Jpeg.decodeLuma(bytes)
    assert(got.isDefined, "JDK-encoded JPEG undecoded")
    val (gw, gh, plane) = got.get
    assert((gw, gh) == (w, h))
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var sumAbs = 0L
    var maxAbs = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = back.getRGB(x, y)
      val yy = Math.round(0.299 * ((rgb >> 16) & 0xFF) +
        0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)).toInt
      val d = math.abs((plane(y * w + x) & 0xFF) - yy)
      sumAbs += d
      maxAbs = math.max(maxAbs, d)
    }
    // IDCT rounding (+-1) plus Y -> RGB -> Y inversion rounding (+-1)
    assert(maxAbs <= 3, s"max |diff| $maxAbs")
    assert(sumAbs.toDouble / (w * h) <= 1.0,
      s"mean |diff| ${sumAbs.toDouble / (w * h)}")
  }

  test("cross-format: flat BMP twin lands the identical content hash") {
    for (id <- 0L until 100L) {
      val jpeg = Jpeg.decodeContent(Jpeg.synthJpegContent(id))
      val bmp = Multimodal.decodeBmpContent(Jpeg.synthJpegTwinBmp(id))
      assert(jpeg.isDefined && bmp.isDefined, s"id=$id")
      assert(jpeg.get._1 == bmp.get._1, s"id=$id hash")
      assert(jpeg.get._2 == bmp.get._2, s"id=$id bands")
    }
  }

  test("the scanless MEDIA-1 header fixture still stub-falls-back") {
    // synthContainer's 35-byte JPEG has no DHT/DQT/SOS — decode must
    // return None so extractFeatures keeps the labeled stub for it
    assert(Jpeg.decodeContent(Multimodal.synthContainer(3)).isEmpty)
  }

  test("hostile and truncated streams return None, never throw") {
    val good = Jpeg.synthJpegContent(7)
    val full = Jpeg.decodeContent(good)
    assert(full.isDefined)
    // truncation at every length: cutting into the entropy stream (or
    // earlier) must fail; cutting ONLY the trailing EOI marker leaves
    // a complete stream that decodes to the full image (the lenient
    // behavior of every real decoder)
    for (n <- 0 until good.length) {
      val cut = java.util.Arrays.copyOf(good, n)
      val got = Jpeg.decodeContent(cut)
      if (n < good.length - 2)
        assert(got.isEmpty, s"truncated at $n decoded")
      else
        assert(got == full, s"EOI-only cut at $n changed the result")
    }
    // flipping SOF0 -> SOF2 leaves a baseline-shaped SOS (Ss=0,Se=63)
    // that is INVALID for a progressive frame — must fail closed, not
    // misread the sequential scan as progressive
    val prog = good.clone()
    val sofAt = {
      var i = 2
      while (!(prog(i) == 0xFF.toByte && prog(i + 1) == 0xC0.toByte))
        i += 1
      i
    }
    prog(sofAt + 1) = 0xC2.toByte
    assert(Jpeg.decodeContent(prog).isEmpty,
      "SOF2 frame with a sequential scan header accepted")
    // flipped bits anywhere must not throw (may or may not decode)
    for (i <- 2 until good.length) {
      val mut = good.clone()
      mut(i) = (mut(i) ^ 0x41).toByte
      Jpeg.decodeContent(mut) // no exception = pass
    }
    // empty / garbage
    assert(Jpeg.decodeContent(Array.emptyByteArray).isEmpty)
    assert(Jpeg.decodeContent(Array.fill[Byte](64)(0x55)).isEmpty)
  }

  test("restart markers: DRI fixtures decode identically to DRI-free") {
    for (id <- 0L until 40L) {
      val (w, h) = Jpeg.synthJpegDims(id)
      val pix = (x: Int, y: Int) => Jpeg.tileLuma(id, x / 8, y / 8)
      val plain = Jpeg.decodeLuma(
        Jpeg.encodeGray(w, h, pix, Array.fill(64)(8), dri = 0))
      val rst = Jpeg.decodeLuma(
        Jpeg.encodeGray(w, h, pix, Array.fill(64)(8), dri = 1))
      assert(plain.isDefined && rst.isDefined, s"id=$id")
      assert(plain.get._3.toSeq == rst.get._3.toSeq, s"id=$id")
    }
  }

  test("MEDIA-7: progressive flat fixtures decode bit-exactly") {
    // covers both script variants (plain AC first scan / AC successive
    // approximation with a refinement EOB-run scan) and DRI restarts
    for (id <- 0L until 200L) {
      val (w, h, exp) = expectedLuma(id)
      val got = Jpeg.decodeLuma(Jpeg.synthJpegProgContent(id))
      assert(got.isDefined, s"id=$id undecoded")
      val (gw, gh, plane) = got.get
      assert((gw, gh) == (w, h), s"id=$id dims")
      assert(plane.map(_ & 0xFF).toSeq == exp.toSeq, s"id=$id pixels")
    }
  }

  test("MEDIA-7: progressive == baseline on textured (lossy) content") {
    // with acAl=0 the single AC first scan carries full precision, so
    // the coefficients — and therefore our IDCT output — must be
    // IDENTICAL to the baseline encode of the same pixels
    for (id <- 0L until 60L) {
      val (w, h) = Jpeg.synthJpegDims(id)
      val pix = (x: Int, y: Int) =>
        ((id * 7 + x * 13 + y * 31 + ((x * y) % 17) * 11) % 256).toInt
      val base = Jpeg.decodeLuma(
        Jpeg.encodeGray(w, h, pix, Jpeg.StdLumaQuant))
      val prog = Jpeg.decodeLuma(
        Jpeg.encodeGrayProg(w, h, pix, Jpeg.StdLumaQuant,
          dri = if (id % 4 == 0) 3 else 0))
      assert(base.isDefined && prog.isDefined, s"id=$id")
      assert(base.get._3.toSeq == prog.get._3.toSeq, s"id=$id pixels")
    }
  }

  test("MEDIA-7: decodes the JDK writer's own progressive output") {
    // ImageIO's progressive mode emits the libjpeg standard scan
    // script — spectral selection AND successive approximation with
    // real correction bits on textured data; grayscale first
    def progressiveBytes(img: java.awt.image.BufferedImage)
        : Array[Byte] = {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpg").next()
      val p = writer.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val buf = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close()
      writer.dispose()
      buf.toByteArray
    }
    val w = 48
    val h = 40
    val gray = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0, (x * 11 + y * 23 + (x * y) % 29) % 256)
    val gb = progressiveBytes(gray)
    // sanity: the writer really emitted SOF2
    assert((2 until gb.length - 1).exists(i =>
      gb(i) == 0xFF.toByte && gb(i + 1) == 0xC2.toByte), "writer not progressive")
    val got = Jpeg.decodeLuma(gb)
    assert(got.isDefined, "JDK progressive grayscale undecoded")
    val (gw, gh, plane) = got.get
    assert((gw, gh) == (w, h))
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gb))
    for (y <- 0 until h; x <- 0 until w) {
      val ours = plane(y * w + x) & 0xFF
      val theirs = back.getRaster.getSample(x, y, 0)
      assert(math.abs(ours - theirs) <= 1, s"($x,$y): $ours vs $theirs")
    }
    // 3-component progressive: near-gray gradient, luma recovered
    // from ImageIO's RGB (the baseline 4:2:0 test's protocol)
    val rgb = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = x * 3 + y * 2
      rgb.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val cb = progressiveBytes(rgb)
    val got3 = Jpeg.decodeLuma(cb)
    assert(got3.isDefined, "JDK progressive color undecoded")
    val (cw, ch, cplane) = got3.get
    assert((cw, ch) == (w, h))
    val back3 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(cb))
    var maxAbs = 0
    var sumAbs = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val px = back3.getRGB(x, y)
      val yy = Math.round(0.299 * ((px >> 16) & 0xFF) +
        0.587 * ((px >> 8) & 0xFF) + 0.114 * (px & 0xFF)).toInt
      val d = math.abs((cplane(y * w + x) & 0xFF) - yy)
      maxAbs = math.max(maxAbs, d)
      sumAbs += d
    }
    assert(maxAbs <= 3, s"max |diff| $maxAbs")
    assert(sumAbs.toDouble / (w * h) <= 1.0,
      s"mean |diff| ${sumAbs.toDouble / (w * h)}")
  }

  test("MEDIA-7: hostile/truncated progressive streams never throw") {
    val good = Jpeg.synthJpegProgContent(9) // odd id: refinement scans
    val full = Jpeg.decodeContent(good)
    assert(full.isDefined)
    // progressive decode REQUIRES the EOI (that is when the plane is
    // assembled) — every truncation must fail closed
    for (n <- 0 until good.length) {
      val cut = java.util.Arrays.copyOf(good, n)
      assert(Jpeg.decodeContent(cut).isEmpty, s"truncated at $n decoded")
    }
    for (i <- 2 until good.length) {
      val mut = good.clone()
      mut(i) = (mut(i) ^ 0x41).toByte
      Jpeg.decodeContent(mut) // no exception = pass
    }
  }

  test("determinism: repeated decode of the lossy family is bit-equal") {
    for (id <- 0L until 30L) {
      val bytes = Jpeg.synthTexturedJpeg(id)
      val a = Jpeg.decodeContent(bytes)
      val b = Jpeg.decodeContent(bytes)
      assert(a == b, s"id=$id")
    }
  }
}
