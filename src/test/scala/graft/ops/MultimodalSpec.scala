package graft.ops

import graft.pipe.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("binary columns round-trip through parquet and feature pass") {
    import spark.implicits._
    val media = Multimodal.synthMedia(spark, 50)
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
      .toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(spark, back).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.embedding.length == Multimodal.EmbeddingDim))
    assert(feats.forall(f => f.width >= 64 && f.height >= 64))
    assert(feats.count(_.kind == "video") > 0)
    // determinism: same id -> same features regardless of partitioning
    val feats2 = Multimodal.extractFeatures(spark,
      Multimodal.synthMedia(spark, 50).repartition(7)).collect()
    assert(feats.sortBy(_.media_id).map(_.content_hash).toSeq ==
      feats2.sortBy(_.media_id).map(_.content_hash).toSeq)
  }

  test("container-header parsers recover synthesized dims (MEDIA-1)") {
    for (id <- 0L until 100L) {
      val (w, h, frames) = Multimodal.synthDims(id)
      val bytes = Multimodal.synthContainer(id)
      val parsed = Multimodal.parseContainerHeader(bytes)
      assert(parsed.isDefined, s"id=$id unparsed")
      val (fmt, pw, ph, pf) = parsed.get
      val expFmt = Seq("png", "gif", "bmp", "jpeg", "wav")((id % 5).toInt)
      assert(fmt == expFmt, s"id=$id")
      if (fmt == "wav") {
        assert((pw, ph, pf) == (0, 0, frames), s"id=$id")
        assert(bytes.length == 44 + 2 * frames)
      } else if (fmt == "gif") {
        val gf = Multimodal.synthGifFrames(id)
        assert((pw, ph, pf) == (w, h, gf), s"id=$id got ($pw,$ph,$pf)")
        assert(bytes.length == 14 + 22 * gf, s"id=$id")
      } else {
        assert((pw, ph, pf) == (w, h, 1), s"id=$id got ($pw,$ph,$pf)")
        val expLen = Map("png" -> 45, "bmp" -> 54, "jpeg" -> 35)(fmt)
        assert(bytes.length == expLen, s"id=$id")
      }
    }
  }

  test("hand-built headers parse per the published specs") {
    // PNG 640x480 (big-endian dims at 16/20)
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xE0, 8, 6, 0, 0, 0)
      .map(_.toByte)
    assert(Multimodal.parsePng(png).contains(("png", 640, 480, 1)))
    // GIF 320x200 (little-endian dims at 6/8)
    val gif = ("GIF89a".getBytes("ASCII") ++
      Array[Int](0x40, 0x01, 0xC8, 0x00, 0, 0, 0).map(_.toByte))
    assert(Multimodal.parseGif(gif).contains(("gif", 320, 200, 1)))
    // BMP 100 x -200 (top-down height reported as magnitude)
    val bmp = new Array[Byte](54)
    bmp(0) = 'B'; bmp(1) = 'M'; bmp(14) = 40
    bmp(18) = 100 // width LE
    val negH = -200
    bmp(22) = (negH & 0xFF).toByte; bmp(23) = ((negH >> 8) & 0xFF).toByte
    bmp(24) = ((negH >> 16) & 0xFF).toByte
    bmp(25) = ((negH >> 24) & 0xFF).toByte
    assert(Multimodal.parseBmp(bmp).contains(("bmp", 100, 200, 1)))
  }

  test("unknown or truncated magic falls back to the stub") {
    import spark.implicits._
    val junk = Seq(
      Multimodal.MediaRow(1L, "image", "plain text payload".getBytes),
      Multimodal.MediaRow(2L, "image", Array[Byte](0x89.toByte, 'P')),
      Multimodal.MediaRow(3L, "image",
        Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte)))
    val feats = Multimodal.extractFeatures(spark,
      spark.createDataset(junk)).collect().sortBy(_.media_id)
    assert(feats.forall(_.format == "unknown"))
    assert(feats.forall(f => f.width >= 64)) // stub-derived
  }

  test("extractHeaders is genuinely header-only: a PNG whose content " +
    "stream is corrupt still yields real header metadata, and a short " +
    "fmt chunk cannot leak fields from the following chunk") {
    import spark.implicits._
    // valid full PNG, then flip a byte inside IDAT: content decode
    // would reject it (CRC), but the header path must not care — it
    // never attempts content decode at all
    val png = Multimodal.synthPngContent(6L)
    val broken = png.clone()
    broken(broken.length - 20) = (broken(broken.length - 20) ^ 0x5A).toByte
    val (w, h) = Multimodal.synthContentDims(6L)
    val rows = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", broken)))
    val hdr = Multimodal.extractHeaders(spark, rows).collect().head
    assert((hdr.format, hdr.width, hdr.height) == ("png", w, h))
    // the content path, by contrast, falls back to the stub on the
    // same bytes (CRC-verified chunks)
    val feat = Multimodal.extractFeatures(spark, rows).collect().head
    val intact = Multimodal.extractFeatures(spark, spark.createDataset(
      Seq(Multimodal.MediaRow(1L, "image", png)))).collect().head
    assert(feat.content_hash != intact.content_hash)
    // ADVICE guard: a WAV fmt chunk declaring size < 16 must not have
    // audioFormat/bitsPerSample read from the following chunk's bytes
    val wav = Multimodal.synthContentContainer(7L) // odd id -> WAV
    val short = wav.clone()
    short(16) = 4; short(17) = 0; short(18) = 0; short(19) = 0 // size=4
    assert(Multimodal.decodeWavContent(short).isEmpty)
  }

  test("header parsers never throw or hang on hostile bytes (fuzz)") {
    val r = new java.util.Random(99)
    // random garbage of assorted sizes
    for (_ <- 0 until 2000) {
      val b = new Array[Byte](r.nextInt(200))
      r.nextBytes(b)
      Multimodal.parseContainerHeader(b) // must return, any value
    }
    // truncations and single-byte mutations of every valid container
    for (id <- 0L until 50L) {
      val valid = Multimodal.synthContainer(id)
      for (cut <- 0 to math.min(valid.length, 60))
        Multimodal.parseContainerHeader(valid.take(cut))
      for (_ <- 0 until 40) {
        val m = valid.clone()
        m(r.nextInt(m.length)) = r.nextInt(256).toByte
        Multimodal.parseContainerHeader(m)
      }
    }
    // the specific hazard: a WAV chunk with a huge u32 size must not
    // walk the cursor backwards (pre-fix: size.toInt < 0 looped forever)
    val wav = Multimodal.synthContainer(4L) // kind 4 = wav
    val evil = wav.clone()
    evil(16) = 0x10; evil(17) = 0; evil(18) = 0; evil(19) = 0x80.toByte
    Multimodal.parseContainerHeader(evil) // must return
  }

  test("MEDIA-2: BMP pixel decode recovers the synthesis formulas " +
    "from the bytes (bottom-up BGR rows + padding)") {
    for (id <- Seq(0L, 2L, 26L, 100L)) {
      val bytes = Multimodal.synthContentContainer(id)
      val (hash, emb) = Multimodal.decodeBmpContent(bytes).get
      // independent recomputation straight from the formulas
      val (w, h) = Multimodal.synthContentDims(id)
      var expHash = 0xCBF29CE484222325L
      val sums = new Array[Long](8)
      val cnts = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.synthContentPixel(id, x, y)
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        expHash ^= luma
        expHash *= 0x100000001B3L
        sums(y * 8 / h) += luma
        cnts(y * 8 / h) += 1
      }
      assert(hash == expHash, id)
      assert(emb == (0 until 8).map(d =>
        if (cnts(d) == 0) 0f else (sums(d) / cnts(d)).toFloat), id)
    }
  }

  test("MEDIA-4: real PNG decode — chunk walk + CRC verify + inflate " +
    "+ all five scanline filters recover the synthesis formulas") {
    // ids with h >= 5 exercise every filter (f = (id+y) % 5 per row)
    for (id <- Seq(0L, 1L, 5L, 23L, 149L, 150L)) {
      val png = Multimodal.synthPngContent(id)
      val (hash, emb) = Multimodal.decodePngContent(png).get
      val (w, h) = Multimodal.synthContentDims(id)
      var expHash = 0xCBF29CE484222325L
      val sums = new Array[Long](8)
      val cnts = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.synthContentPixel(id, x, y)
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        expHash ^= luma
        expHash *= 0x100000001B3L
        sums(y * 8 / h) += luma
        cnts(y * 8 / h) += 1
      }
      assert(hash == expHash, id)
      assert(emb == (0 until 8).map(d =>
        if (cnts(d) == 0) 0f else (sums(d) / cnts(d)).toFloat), id)
    }
  }

  test("MEDIA-4: tampered CRC, truncated stream, and header-only PNGs " +
    "fall back to the stub (None), never throw") {
    val png = Multimodal.synthPngContent(10L)
    val crcTamper = png.clone()
    crcTamper(crcTamper.length - 1) =
      (crcTamper(crcTamper.length - 1) ^ 0xFF).toByte
    assert(Multimodal.decodePngContent(crcTamper).isEmpty)
    val dataTamper = png.clone()
    dataTamper(60) = (dataTamper(60) ^ 0x55).toByte // inside IDAT
    assert(Multimodal.decodePngContent(dataTamper).isEmpty)
    val trunc = java.util.Arrays.copyOf(png, png.length - 20)
    assert(Multimodal.decodePngContent(trunc).isEmpty)
    // MEDIA-1's header-only PNG carries zero CRCs -> stub fallback
    assert(Multimodal.decodePngContent(
      Multimodal.synthContainer(0L)).isEmpty)
  }

  test("MEDIA-5: GIF LZW decode recovers the synthesis formulas and " +
    "agrees with the PNG decode of the same pixels") {
    for (id <- 0L until 60L) {
      val got = Multimodal.decodeGifContent(Multimodal.synthGifContent(id))
      assert(got.isDefined, s"id=$id gif undecoded")
      // formula recompute (the BMP/PNG content contract)
      val (w, h) = Multimodal.synthContentDims(id)
      var hash = 0xCBF29CE484222325L
      val sums = new Array[Long](8)
      val cnts = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.synthContentPixel(id, x, y)
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        hash ^= luma; hash *= 0x100000001B3L
        sums(y * 8 / h) += luma; cnts(y * 8 / h) += 1
      }
      val expEmb = (0 until 8).map(d =>
        if (cnts(d) == 0) 0f else (sums(d) / cnts(d)).toFloat)
      assert(got.get._1 == hash, s"id=$id hash")
      assert(got.get._2 == expEmb, s"id=$id bands")
      // three-way cross-format identity
      val png = Multimodal.decodePngContent(Multimodal.synthPngContent(id))
      assert(png.get._1 == got.get._1, s"id=$id gif!=png")
    }
  }

  test("MEDIA-5 independence: the JDK's own ImageIO GIF codec decodes " +
    "our encoder's output to the formula pixels, and our decoder reads " +
    "ImageIO's encoder output — no shared-bug circularity") {
    for (id <- Seq(0L, 3L, 7L, 12L, 31L, 58L)) {
      val (w, h) = Multimodal.synthContentDims(id)
      // our encoder -> ImageIO decoder
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.synthGifContent(id)))
      assert(img.getWidth == w && img.getHeight == h, s"id=$id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.synthContentPixel(id, x, y)
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF) ==
          ((r, g, b)), s"id=$id pixel ($x,$y)")
      }
      // ImageIO encoder -> our decoder: render the same pixels into an
      // indexed image and let the JDK write the GIF (its own palette +
      // its own LZW encoder)
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.synthContentPixel(id, x, y)
        out.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(out, "gif", buf))
      val ours = Multimodal.decodeGifContent(buf.toByteArray)
      val exp = Multimodal.decodeGifContent(Multimodal.synthGifContent(id))
      assert(ours.isDefined, s"id=$id imageio gif undecoded by us")
      assert(ours.get._1 == exp.get._1, s"id=$id imageio-gif hash")
    }
  }

  test("MEDIA-5: interlace is honored as a row order, and hostile GIF " +
    "bytes fall back to the stub (None), never throw or hang") {
    // flipping the interlace flag on a sequentially-stored stream must
    // REORDER rows (different hash), not fail — the decoder reads the
    // flag for real
    val g = Multimodal.synthGifContent(4L) // h=8: nontrivial reorder
    val descIdx = g.indexWhere(_ == 0x2C.toByte, 13)
    val interlaced = g.clone()
    interlaced(descIdx + 9) = (interlaced(descIdx + 9) | 0x40).toByte
    val straight = Multimodal.decodeGifContent(g)
    val reordered = Multimodal.decodeGifContent(interlaced)
    assert(reordered.isDefined)
    assert(reordered.get._1 != straight.get._1)
    // fuzz: random garbage, truncations, mutations
    val r = new java.util.Random(177)
    for (_ <- 0 until 1000) {
      val b = new Array[Byte](r.nextInt(300))
      r.nextBytes(b)
      Multimodal.decodeGifContent(b)
    }
    for (id <- 0L until 25L) {
      val valid = Multimodal.synthGifContent(id)
      for (cut <- 0 until valid.length by 7)
        Multimodal.decodeGifContent(valid.take(cut))
      for (_ <- 0 until 60) {
        val m = valid.clone()
        m(r.nextInt(m.length)) = r.nextInt(256).toByte
        Multimodal.decodeGifContent(m) // any result, no throw/hang
      }
    }
  }

  test("MEDIA-2: WAV PCM decode recovers the synthesis formulas " +
    "(LE 16-bit words, signed)") {
    for (id <- Seq(1L, 3L, 77L, 149L)) {
      val bytes = Multimodal.synthContentContainer(id)
      val (hash, emb) = Multimodal.decodeWavContent(bytes).get
      val samples = Multimodal.synthContentSamples(id)
      var expHash = 0xCBF29CE484222325L
      for (v <- samples) {
        val u = if (v < 0) v + 65536 else v
        expHash ^= (u & 0xFF); expHash *= 0x100000001B3L
        expHash ^= (u >>> 8); expHash *= 0x100000001B3L
      }
      val sums = new Array[Long](8)
      val cnts = new Array[Long](8)
      for (i <- samples.indices) {
        sums(i * 8 / samples.length) += math.abs(samples(i))
        cnts(i * 8 / samples.length) += 1
      }
      assert(hash == expHash, id)
      assert(emb == (0 until 8).map(d =>
        if (cnts(d) == 0) 0f else (sums(d) / cnts(d)).toFloat), id)
    }
  }

  test("MEDIA-2: byte-distinct twins decode to identical content " +
    "(the case raw-byte dedup misses)") {
    for (id <- Seq(0L, 3L, 6L, 9L)) { // both parities among multiples of 3
      val base = Multimodal.synthContentContainer(id)
      val twin = Multimodal.synthContentTwin(id)
      assert(!java.util.Arrays.equals(base, twin), id) // md5 would differ
      val dec = (b: Array[Byte]) =>
        if (id % 2 == 0) Multimodal.decodeBmpContent(b)
        else Multimodal.decodeWavContent(b)
      assert(dec(base) == dec(twin), id) // content hash+embedding equal
      assert(dec(base).nonEmpty, id)
    }
  }

  test("MEDIA-2 content decoders never throw on hostile bytes (fuzz)") {
    val r = new java.util.Random(7)
    for (_ <- 0 until 2000) {
      val b = new Array[Byte](r.nextInt(300))
      r.nextBytes(b)
      Multimodal.decodeBmpContent(b)
      Multimodal.decodeWavContent(b)
    }
    for (id <- 0L until 40L) {
      val valid = Multimodal.synthContentContainer(id)
      for (cut <- 0 to math.min(valid.length, 80)) {
        Multimodal.decodeBmpContent(valid.take(cut))
        Multimodal.decodeWavContent(valid.take(cut))
      }
      for (_ <- 0 until 40) {
        val m = valid.clone()
        m(r.nextInt(m.length)) = r.nextInt(256).toByte
        Multimodal.decodeBmpContent(m)
        Multimodal.decodeWavContent(m)
      }
    }
    // hostile dims: a BMP header claiming w*h far beyond the payload
    // must be rejected by the length bound, not walk off the array
    val evil = Multimodal.synthContentContainer(0L).clone()
    evil(18) = 0xFF.toByte; evil(19) = 0xFF.toByte
    evil(20) = 0x0F.toByte; evil(21) = 0
    assert(Multimodal.decodeBmpContent(evil).isEmpty)
  }

  test("graft_media_meta SQL function decodes headers via codegen") {
    import spark.implicits._
    graft.functions.GraftOpFunctions.register(spark)
    spark.range(30).map(id =>
      (id, Multimodal.synthContainer(id)))
      .toDF("id", "payload")
      .createOrReplaceTempView("media_sql_test")
    val rows = spark.sql(
      "SELECT id, graft_media_meta(payload) AS m FROM media_sql_test")
      .selectExpr("id", "m.format", "m.width", "m.height", "m.n_frames")
      .collect()
    assert(rows.length == 30)
    for (r <- rows) {
      val id = r.getLong(0)
      val (w, h, frames) = Multimodal.synthDims(id)
      val expFmt = Seq("png", "gif", "bmp", "jpeg", "wav")((id % 5).toInt)
      assert(r.getString(1) == expFmt, s"id=$id")
      if (expFmt == "wav")
        assert((r.getInt(2), r.getInt(3), r.getInt(4)) == (0, 0, frames))
      else if (expFmt == "gif")
        assert((r.getInt(2), r.getInt(3), r.getInt(4)) ==
          (w, h, Multimodal.synthGifFrames(id)))
      else
        assert((r.getInt(2), r.getInt(3), r.getInt(4)) == (w, h, 1))
    }
  }

  test("embedding from bytes feeds the ANN path") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.synthMedia(spark, 40))
    val corpus = feats.select($"media_id".as("id"),
      $"embedding".as("vec"))
    val queries = feats.filter($"media_id" < 2)
      .select($"media_id".as("qid"), $"embedding".as("qvec"))
    val top = Ann.bruteForceTopK(spark, corpus, queries, 3).collect()
    assert(top.length == 6) // 2 queries x top-3
  }
}
