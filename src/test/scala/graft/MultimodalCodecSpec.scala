package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.BmpCodec

/** Byte-level checks of the real BMP codec, independent of the query
  * oracles: a hand-crafted file (bytes written out literally, nothing
  * shared with the encoder) must decode to known pixels, in both
  * bottom-up and top-down row order. */
class MultimodalCodecSpec extends AnyFunSuite {

  /** 2x2 24-bit BMP, bottom-up, stride 8 (2 pad bytes per row).
    * Image (top-down): (0,0)=red (1,0)=green / (0,1)=blue (1,1)=white.
    * Stored bottom-up BGR: row y=1 first. */
  private def handBmp(topDown: Boolean): Array[Byte] = {
    val h = if (topDown) -2 else 2
    val header = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0, 2, 0, 0, 0, h & 0xFF, (h >> 8) & 0xFF,
      (h >> 16) & 0xFF, (h >> 24) & 0xFF, 1, 0, 24, 0) ++
      Array.fill(24)(0) // compression/sizes/ppm/colors all zero
    assert(header.length == 54)
    val rowTop = Array[Int](0, 0, 255, 0, 255, 0, 0, 0) // red, green + pad
    val rowBot = Array[Int](255, 0, 0, 255, 255, 255, 0, 0) // blue, white + pad
    val rows = if (topDown) rowTop ++ rowBot else rowBot ++ rowTop
    (header ++ rows).map(_.toByte)
  }

  test("hand-crafted bottom-up BMP decodes to known pixels") {
    val img = BmpCodec.decode(handBmp(topDown = false))
    assert(img.w == 2 && img.h == 2)
    assert((img.r(0, 0), img.g(0, 0), img.b(0, 0)) == ((255, 0, 0)))
    assert((img.r(1, 0), img.g(1, 0), img.b(1, 0)) == ((0, 255, 0)))
    assert((img.r(0, 1), img.g(0, 1), img.b(0, 1)) == ((0, 0, 255)))
    assert((img.r(1, 1), img.g(1, 1), img.b(1, 1)) == ((255, 255, 255)))
  }

  test("negative-height (top-down) BMP decodes identically") {
    val bu = BmpCodec.decode(handBmp(topDown = false))
    val td = BmpCodec.decode(handBmp(topDown = true))
    assert(bu.px.toSeq == td.px.toSeq)
  }

  test("encode/decode roundtrip reproduces the synthesis formula") {
    for (id <- Seq(0L, 3L, 42L, 255L, 444L)) {
      val (w, h) = BmpCodec.dims(id)
      val img = BmpCodec.decode(BmpCodec.encode(id))
      assert(img.w == w && img.h == h)
      for { y <- 0 until h; x <- 0 until w } {
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) ==
          BmpCodec.pixel(id, x, y), s"id=$id ($x,$y)")
      }
    }
  }

  test("PPM and BMP containers decode to identical images") {
    import graft.operators.Multimodal.PpmCodec
    for (id <- Seq(0L, 3L, 42L, 255L)) {
      val viaBmp = BmpCodec.decode(BmpCodec.encode(id))
      val viaPpm = PpmCodec.decode(PpmCodec.encode(id))
      assert(viaBmp.w == viaPpm.w && viaBmp.h == viaPpm.h)
      assert(viaBmp.px.toSeq == viaPpm.px.toSeq, s"id=$id")
    }
  }

  test("hand-crafted PPM with comments and odd whitespace decodes") {
    import graft.operators.Multimodal.PpmCodec
    // 2x1: red then blue; header split across lines with a comment
    val bytes = "P6\n# a comment\n 2\n1 # trailing\n255\n"
      .getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte)
    val img = PpmCodec.decode(bytes)
    assert(img.w == 2 && img.h == 1)
    assert((img.r(0, 0), img.g(0, 0), img.b(0, 0)) == ((255, 0, 0)))
    assert((img.r(1, 0), img.g(1, 0), img.b(1, 0)) == ((0, 0, 255)))
  }

  test("malformed inputs are rejected, not misparsed") {
    intercept[IllegalArgumentException](BmpCodec.decode(Array[Byte](1, 2, 3)))
    val bad = handBmp(topDown = false)
    bad(28) = 8 // 8-bpp palette variant: unsupported, must refuse
    intercept[IllegalArgumentException](BmpCodec.decode(bad))
    val short = handBmp(topDown = false).take(60)
    intercept[IllegalArgumentException](BmpCodec.decode(short))
  }

  test("WAV roundtrip reproduces the synthesis formula") {
    import graft.operators.Multimodal.WavCodec
    for (id <- Seq(1L, 7L, 58L, 1234L)) {
      val a = WavCodec.decode(WavCodec.encode(id))
      assert(a.sampleRate == WavCodec.rate(id))
      assert(a.samples.length == WavCodec.nSamples(id))
      for (i <- a.samples.indices)
        assert(a.samples(i).toInt == WavCodec.sample(id, i), s"id $id i $i")
    }
  }

  test("WAV chunk walk skips unknown chunks, word-aligned") {
    import graft.operators.Multimodal.WavCodec
    val base = WavCodec.encode(10L)
    // splice an odd-sized LIST chunk between fmt and data; the parser
    // must skip it (with pad byte) and still find the data chunk
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0)
    val spliced = base.slice(0, 36) ++ extra ++ base.slice(36, base.length)
    // patch the RIFF size field
    val sz = spliced.length - 8
    spliced(4) = sz.toByte; spliced(5) = (sz >>> 8).toByte
    spliced(6) = (sz >>> 16).toByte; spliced(7) = (sz >>> 24).toByte
    val a = WavCodec.decode(spliced)
    assert(a.sampleRate == WavCodec.rate(10L))
    assert(a.samples.length == WavCodec.nSamples(10L))
  }

  test("G.711 expansion matches the ITU endpoint values; companded WAVs " +
      "decode through the same chunk walk; unknown format tags reject") {
    import graft.operators.Multimodal.WavCodec
    // endpoint codewords from the G.711 tables: zero, and both rails
    assert(WavCodec.ulawExpand(0xFF) == 0)    // +0
    assert(WavCodec.ulawExpand(0x7F) == 0)    // -0
    assert(WavCodec.ulawExpand(0x80) == 32124)
    assert(WavCodec.ulawExpand(0x00) == -32124)
    assert(WavCodec.alawExpand(0xD5) == 8)    // smallest positive step
    assert(WavCodec.alawExpand(0x55) == -8)
    assert(WavCodec.alawExpand(0xAA) == 32256)
    assert(WavCodec.alawExpand(0x2A) == -32256)
    // sign symmetry: flipping codeword bit 7 negates the sample
    for (b <- 0 until 256) {
      assert(WavCodec.ulawExpand(b ^ 0x80) == -WavCodec.ulawExpand(b))
      assert(WavCodec.alawExpand(b ^ 0x80) == -WavCodec.alawExpand(b))
    }
    // µ-law magnitudes are strictly monotone in codeword magnitude
    // (0x7F down to 0x00 = -0 out to -32124)
    for (b <- 1 until 128)
      assert(WavCodec.ulawExpand(b - 1) < WavCodec.ulawExpand(b))
    for (alaw <- Seq(false, true); id <- Seq(4L, 7L, 11L, 700L)) {
      val a = WavCodec.decode(WavCodec.encodeG711(id, alaw))
      assert(a.sampleRate == WavCodec.rate(id))
      assert(a.samples.length == WavCodec.nSamples(id))
      for (i <- a.samples.indices) {
        val b = WavCodec.g711Byte(id, i)
        val want = if (alaw) WavCodec.alawExpand(b) else WavCodec.ulawExpand(b)
        assert(a.samples(i).toInt == want, s"alaw=$alaw id $id sample $i")
      }
    }
    // an unsupported format tag (e.g. 2 = ADPCM) rejects, not misparses
    val bad = WavCodec.encodeG711(4L, alaw = false)
    bad(20) = 2
    intercept[IllegalArgumentException](WavCodec.decode(bad))
  }

  test("IMA ADPCM decodes a hand-computed vector; blocks restart state; " +
      "malformed blocks reject") {
    import graft.operators.Multimodal.WavCodec
    // hand-build a minimal mono ADPCM WAV: blockAlign 5 = 4-byte state
    // header + ONE nibble byte (2 codes, 3 samples/block)
    def wav(blocks: Seq[(Int, Int, Int)]): Array[Byte] = {
      val blockAlign = 5
      val data = blocks.flatMap { case (pred0, idx0, nibbles) =>
        Seq((pred0 & 0xFF).toByte, ((pred0 >> 8) & 0xFF).toByte,
          idx0.toByte, 0.toByte, nibbles.toByte)
      }.toArray
      val out = new Array[Byte](48 + data.length)
      def le32(off: Int, v: Int): Unit = {
        out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
        out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
      }
      def le16(off: Int, v: Int): Unit = {
        out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      }
      def tag(off: Int, s: String): Unit =
        (0 until 4).foreach(i => out(off + i) = s.charAt(i).toByte)
      tag(0, "RIFF"); le32(4, 40 + data.length); tag(8, "WAVE")
      tag(12, "fmt "); le32(16, 20)
      le16(20, 0x11); le16(22, 1); le32(24, 8000)
      le32(28, 8000 * blockAlign / 3); le16(32, blockAlign); le16(34, 4)
      le16(36, 2); le16(38, 3)
      tag(40, "data"); le32(44, data.length)
      System.arraycopy(data, 0, out, 48, data.length)
      out
    }
    // block (pred0=0, idx0=0, byte 0x70): header sample 0; code 0 (low
    // nibble) at step 7 → diff 0, pred 0, idx clamps -1→0; code 7
    // (high nibble) at step 7 → diff 0+1+3+7 = 11, pred 11, idx 8
    val a = WavCodec.decode(wav(Seq((0, 0, 0x70))))
    assert(a.samples.toSeq == Seq[Short](0, 0, 11))
    // a second block restarts state from ITS header, ignoring block 1
    val b = WavCodec.decode(wav(Seq((0, 0, 0x70), (100, 0, 0x70))))
    assert(b.samples.toSeq == Seq[Short](0, 0, 11, 100, 100, 111))
    // positive clamp: predictor at the rail, max-magnitude positive
    // code (7) repeatedly — samples never exceed 32767
    val c = WavCodec.decode(wav(Seq((32760, 88, 0x77))))
    assert(c.samples.toSeq == Seq[Short](32760, 32767, 32767))
    // negative clamp via code 15 (sign bit + max magnitude)
    val n = WavCodec.decode(wav(Seq((-32760, 88, 0xFF))))
    assert(n.samples.toSeq == Seq[Short](-32760, -32768, -32768))
    // fixture roundtrip: block structure + formulas
    for (id <- Seq(1L, 5L, 13L, 701L)) {
      val d = WavCodec.decode(WavCodec.encodeImaAdpcm(id))
      val spb = 1 + 2 * WavCodec.ImaBlockData
      assert(d.sampleRate == WavCodec.rate(id))
      assert(d.samples.length == WavCodec.imaNBlocks(id) * spb)
      (0 until WavCodec.imaNBlocks(id)).foreach { bi =>
        assert(d.samples(bi * spb).toInt == WavCodec.imaPred0(id, bi),
          s"id $id block $bi header sample")
      }
    }
    // rejections: out-of-range step index; non-tiling data chunk
    val badIdx = wav(Seq((0, 89, 0x00)))
    intercept[IllegalArgumentException](WavCodec.decode(badIdx))
    val badTile = wav(Seq((0, 0, 0x00))).dropRight(1)
    // patch the data/RIFF sizes to match the truncated payload
    badTile(44) = 4; badTile(4) = (40 + 4).toByte
    intercept[IllegalArgumentException](WavCodec.decode(badTile))
  }

  test("AVI roundtrip reproduces the per-frame formula") {
    import graft.operators.Multimodal.AviCodec
    for (id <- Seq(2L, 5L, 14L, 701L)) {
      val v = AviCodec.decode(AviCodec.encode(id))
      val (w, h) = BmpCodec.dims(id)
      assert((v.w, v.h) == (w, h))
      assert(v.frames.length == AviCodec.nFrames(id))
      for ((img, f) <- v.frames.zipWithIndex; x <- 0 until w; y <- 0 until h) {
        val (r, g, b) = BmpCodec.pixel(AviCodec.frameId(id, f), x, y)
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) == (r, g, b),
          s"id $id frame $f ($x,$y)")
      }
    }
  }

  test("MJPEG-in-AVI roundtrip reproduces the closed-form JPEG formula " +
      "per frame; dims-mismatched frames reject") {
    import graft.operators.{JpegCodec, Multimodal}
    import Multimodal.AviCodec
    for (id <- Seq(0L, 9L, 18L, 702L)) {
      val bytes = AviCodec.encodeMjpeg(id)
      // the wire really is MJPEG: every frame chunk is '00dc' and its
      // payload opens with a JPEG SOI marker; no '00db' DIB chunks
      assert(new String(bytes, "ISO-8859-1").contains("00dc"))
      assert(!new String(bytes, "ISO-8859-1").contains("00db"))
      val v = AviCodec.decode(bytes)
      val (w, h) = JpegCodec.dims(id)
      assert((v.w, v.h) == (w, h))
      assert(v.frames.length == AviCodec.nFrames(id))
      for ((img, f) <- v.frames.zipWithIndex) {
        // the 154-shift (lcm 14,11) keeps every frame at the declared dims
        assert((img.w, img.h) == (w, h), s"id $id frame $f dims")
        val fid = AviCodec.mjpegFrameId(id, f)
        for (x <- 0 until w; y <- 0 until h) {
          val (r, g, b) = JpegCodec.expectedRgb(fid, x, y)
          assert((img.r(x, y), img.g(x, y), img.b(x, y)) == (r, g, b),
            s"id $id frame $f ($x,$y)")
        }
      }
    }
    // a frame whose JPEG dims disagree with the avih declaration must
    // reject, not silently mis-shape the stream: bump declared width
    val lying = AviCodec.encodeMjpeg(9L)
    val avihWOff = 12 + 12 + 8 + 32 // RIFF hdr + LIST hdr + avih hdr + dwWidth
    lying(avihWOff) = (lying(avihWOff) + 1).toByte
    intercept[IllegalArgumentException](AviCodec.decode(lying))
  }

  test("AVI parser skips unknown chunks and rejects malformed files") {
    import graft.operators.Multimodal.AviCodec
    val base = AviCodec.encode(2L)
    // splice an odd-sized JUNK chunk right after 'AVI ' (before hdrl)
    val junk = Array[Byte]('J', 'U', 'N', 'K', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.slice(0, 12) ++ junk ++ base.slice(12, base.length)
    val sz = spliced.length - 8
    spliced(4) = sz.toByte; spliced(5) = (sz >>> 8).toByte
    spliced(6) = (sz >>> 16).toByte; spliced(7) = (sz >>> 24).toByte
    assert(AviCodec.decode(spliced).frames.length == AviCodec.nFrames(2L))

    intercept[IllegalArgumentException](AviCodec.decode(Array[Byte](1)))
    val notAvi = AviCodec.encode(2L)
    notAvi(8) = 'W'
    intercept[IllegalArgumentException](AviCodec.decode(notAvi))
    // declared frame count must match the movi payload
    val lying = AviCodec.encode(2L)
    val avihTotalOff = 12 + 12 + 8 + 16 // RIFF hdr + LIST hdr + avih hdr
    lying(avihTotalOff) = 99.toByte
    intercept[IllegalArgumentException](AviCodec.decode(lying))
  }

  test("EXIF: both byte orders parse, GPS components exact, scrub " +
      "removes all Exif APP1s without touching pixels, garbage is safe") {
    import graft.operators.{ExifCodec, JpegCodec}
    for (id <- Seq(0L, 1L, 2L, 3L, 6L, 7L, 701L, 702L)) {
      val b = ExifCodec.encodeWithExif(id)
      val ex = ExifCodec.parse(b).getOrElse(fail(s"no EXIF for $id"))
      assert(ex.byteOrder == (if (id % 2 == 0) "II" else "MM"))
      assert(ex.make == s"cam${id % 10}")
      assert(ex.gps.isDefined == (id % 3 == 0))
      ex.gps.foreach { g =>
        assert(g.latRef == ExifCodec.latRef(id) &&
          g.latDeg == ExifCodec.latDeg(id) &&
          g.latMin == ExifCodec.latMin(id) &&
          g.latSecMilli == ExifCodec.latSecMilli(id))
        assert(g.lonRef == ExifCodec.lonRef(id) &&
          g.lonDeg == ExifCodec.lonDeg(id) &&
          g.lonMin == ExifCodec.lonMin(id) &&
          g.lonSecMilli == ExifCodec.lonSecMilli(id))
      }
      // scrub: EXIF gone, pixel stream byte-identical to the plain jpg
      val clean = ExifCodec.scrub(b)
      assert(ExifCodec.parse(clean).isEmpty)
      assert(java.util.Arrays.equals(clean, JpegCodec.encode(id)),
        s"scrub must reproduce the pre-splice JPEG exactly for $id")
      // idempotent; EXIF-free input unchanged
      assert(java.util.Arrays.equals(ExifCodec.scrub(clean), clean))
    }
    // TWO Exif APP1 segments: both removed
    val one = ExifCodec.encodeWithExif(6L)
    val seg = one.slice(2, 2 + 2 + (((one(4) & 0xFF) << 8) | (one(5) & 0xFF)))
    val twice = one.take(2) ++ seg ++ one.drop(2)
    assert(ExifCodec.parse(twice).isDefined)
    assert(ExifCodec.parse(ExifCodec.scrub(twice)).isEmpty)
    // garbage / truncation never throws
    val rnd = new scala.util.Random(779)
    (0 until 3000).foreach { _ =>
      val g = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(g)
      ExifCodec.parse(g); ExifCodec.scrub(g)
    }
    val full = ExifCodec.encodeWithExif(0L)
    (0 to full.length by 7).foreach { k =>
      ExifCodec.parse(full.take(k)); ExifCodec.scrub(full.take(k))
    }
    // corrupt the byte-order marker (offset 12 = first TIFF byte:
    // SOI 2 + APP1 marker/len 4 + "Exif\0\0" 6) -> clean None
    val badMagic = full.clone()
    badMagic(12) = 99
    assert(ExifCodec.parse(badMagic).isEmpty)
  }

  test("ustar tar: roundtrip, 512 padding, checksum verification, " +
      "hand-parsed header offsets, corrupt/truncated rejection") {
    import graft.operators.Multimodal.TarCodec
    val entries = Seq(
      ("0.jpg", Array.tabulate[Byte](700)(i => (i * 7).toByte)),
      ("0.txt", "hello webdataset".getBytes("UTF-8")),
      ("1.jpg", Array.emptyByteArray),               // zero-size entry
      ("1.txt", Array.tabulate[Byte](512)(_.toByte)) // exact block size
    )
    val tar = TarCodec.encode(entries)
    assert(tar.length % 512 == 0, "archive must be block-aligned")
    val back = TarCodec.decode(tar)
    assert(back.map(_._1) == entries.map(_._1))
    back.zip(entries).foreach { case ((_, got), (_, want)) =>
      assert(java.util.Arrays.equals(got, want))
    }
    // header fields at hand-computed offsets: magic + octal size
    assert(new String(tar, 257, 5, "US-ASCII") == "ustar")
    assert(java.lang.Long.parseLong(
      new String(tar, 124, 11, "US-ASCII").trim, 8) == 700)
    // corrupt one data byte -> checksum of ITS header still fine (data
    // is not covered), but corrupt a header byte -> reject
    val corrupt = tar.clone()
    corrupt(1) = (corrupt(1) ^ 0x7F).toByte
    intercept[IllegalArgumentException](TarCodec.decode(corrupt))
    // truncation anywhere inside the archive rejects, never misparses
    Seq(100, 511, 512, 1000, tar.length - 1).foreach { k =>
      intercept[IllegalArgumentException](TarCodec.decode(tar.take(k)))
    }
    // a lying size field that runs past the archive rejects
    val lying = tar.clone()
    System.arraycopy("77777777777 ".getBytes("US-ASCII"), 0, lying, 124, 12)
    intercept[IllegalArgumentException](TarCodec.decode(lying))
  }

  test("PNG roundtrip reproduces the synthesis formula (all 5 filters)") {
    import graft.operators.Multimodal.PngCodec
    // ids spanning every dims residue: heights >= 5 exercise filter
    // types 0-4 (the encoder cycles y % 5)
    for (id <- Seq(0L, 3L, 42L, 255L, 444L, 999L)) {
      val (w, h) = BmpCodec.dims(id)
      val img = PngCodec.decode(PngCodec.encode(id))
      assert(img.w == w && img.h == h)
      for { y <- 0 until h; x <- 0 until w } {
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) ==
          BmpCodec.pixel(id, x, y), s"id=$id ($x,$y)")
      }
    }
  }

  test("PNG cross-checks against the JDK's independent ImageIO codec") {
    import graft.operators.Multimodal.PngCodec
    for (id <- Seq(0L, 3L, 42L, 255L)) {
      // direction 1: our encoder's output parses under ImageIO with the
      // formula's pixels (catches any spec deviation ImageIO rejects or
      // reads differently)
      val ours = PngCodec.encode(id)
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ours))
      assert(javaImg != null, s"ImageIO rejected our PNG for id=$id")
      val (w, h) = BmpCodec.dims(id)
      assert(javaImg.getWidth == w && javaImg.getHeight == h)
      for { y <- 0 until h; x <- 0 until w } {
        val rgb = javaImg.getRGB(x, y)
        assert((rgb >> 16 & 0xFF, rgb >> 8 & 0xFF, rgb & 0xFF) ==
          BmpCodec.pixel(id, x, y), s"ImageIO read id=$id ($x,$y)")
      }
      // direction 2: ImageIO's own encoding (independent filter/strategy
      // choices) must decode identically under our parser
      val buf = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for { y <- 0 until h; x <- 0 until w } {
        val (r, g, b) = BmpCodec.pixel(id, x, y)
        buf.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val out = new java.io.ByteArrayOutputStream
      assert(javax.imageio.ImageIO.write(buf, "png", out))
      val img = PngCodec.decode(out.toByteArray)
      assert(img.w == w && img.h == h)
      for { y <- 0 until h; x <- 0 until w } {
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) ==
          BmpCodec.pixel(id, x, y), s"our decode of ImageIO id=$id ($x,$y)")
      }
    }
  }

  test("TIFF cross-checks against the JDK's independent ImageIO codec " +
      "in both byte orders") {
    import graft.operators.Multimodal.TiffCodec
    for (id <- Seq(0L, 3L, 42L, 255L)) { // even = II, odd = MM
      // direction 1: our encoder's output parses under ImageIO with
      // the formula's pixels (IFD layout, strip arrays, endianness)
      val ours = TiffCodec.encode(id)
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ours))
      assert(javaImg != null, s"ImageIO rejected our TIFF for id=$id")
      val (w, h) = BmpCodec.dims(id)
      assert(javaImg.getWidth == w && javaImg.getHeight == h)
      for { y <- 0 until h; x <- 0 until w } {
        val rgb = javaImg.getRGB(x, y)
        assert((rgb >> 16 & 0xFF, rgb >> 8 & 0xFF, rgb & 0xFF) ==
          BmpCodec.pixel(id, x, y), s"ImageIO read id=$id ($x,$y)")
      }
      // direction 2: ImageIO's own TIFF encoding (its choice of strip
      // layout and tag set) must decode identically under our parser
      val buf = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for { y <- 0 until h; x <- 0 until w } {
        val (r, g, b) = BmpCodec.pixel(id, x, y)
        buf.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val out = new java.io.ByteArrayOutputStream
      assert(javax.imageio.ImageIO.write(buf, "tiff", out))
      val img = TiffCodec.decode(out.toByteArray)
      assert(img.w == w && img.h == h)
      for { y <- 0 until h; x <- 0 until w } {
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) ==
          BmpCodec.pixel(id, x, y), s"our decode of ImageIO id=$id ($x,$y)")
      }
    }
  }

  test("PackBits TIFF round-trips, parses under ImageIO, and the RLE " +
      "survives random buffers") {
    import graft.operators.Multimodal.TiffCodec
    for (id <- Seq(0L, 3L, 42L, 255L)) {
      val ours = TiffCodec.encode(id, packbits = true)
      // smaller than raw for the formula's smooth rows? not guaranteed —
      // just require it decodes identically to the uncompressed form
      val img = TiffCodec.decode(ours)
      val plain = TiffCodec.decode(TiffCodec.encode(id, packbits = false))
      assert(img.w == plain.w && img.h == plain.h &&
        img.px.toSeq == plain.px.toSeq, s"packbits mismatch id=$id")
      // the JDK's independent TIFF reader decodes our PackBits too
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ours))
      assert(javaImg != null, s"ImageIO rejected packbits TIFF id=$id")
      for { y <- 0 until img.h; x <- 0 until img.w } {
        val rgb = javaImg.getRGB(x, y)
        assert((rgb >> 16 & 0xFF, rgb >> 8 & 0xFF, rgb & 0xFF) ==
          BmpCodec.pixel(id, x, y), s"ImageIO packbits id=$id ($x,$y)")
      }
    }
    // RLE property: encode/decode round-trips arbitrary byte runs
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val raw = new Array[Byte](rnd.nextInt(600) + 1)
      var i = 0
      while (i < raw.length) {
        // runs of random length so both literal and repeat paths fire
        val v = rnd.nextInt(4).toByte
        val run = math.min(rnd.nextInt(200) + 1, raw.length - i)
        java.util.Arrays.fill(raw, i, i + run, v)
        i += run
      }
      val back = TiffCodec.unpackBits(TiffCodec.packBits(raw), raw.length)
      assert(back.toSeq == raw.toSeq)
    }
  }

  test("LZW and Deflate TIFFs decode to the uncompressed pixels, parse " +
      "under ImageIO, and ImageIO's own LZW/Deflate output decodes " +
      "under our parser (the early-change interop gate)") {
    import graft.operators.Multimodal.TiffCodec
    for (id <- Seq(0L, 3L, 42L, 255L); comp <- Seq(5, 8)) {
      val ours = TiffCodec.encode(id, comp)
      val img = TiffCodec.decode(ours)
      val plain = TiffCodec.decode(TiffCodec.encode(id))
      assert(img.px.toSeq == plain.px.toSeq,
        s"compression $comp mismatch id=$id")
      // the JDK's independent reader agrees (catches an early-change
      // or KwKwK slip our own round-trip could mask)
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ours))
      assert(javaImg != null, s"ImageIO rejected comp=$comp TIFF id=$id")
      for { y <- 0 until img.h; x <- 0 until img.w } {
        val rgb = javaImg.getRGB(x, y)
        assert((rgb >> 16 & 0xFF, rgb >> 8 & 0xFF, rgb & 0xFF) ==
          BmpCodec.pixel(id, x, y), s"ImageIO comp=$comp id=$id ($x,$y)")
      }
    }
    // predictor 2 (horizontal differencing — what tiffcp -c lzw:2
    // emits): ours decodes it AND ImageIO's independent reader agrees
    for (id <- Seq(0L, 3L, 42L); comp <- Seq(5, 8)) {
      val ours = TiffCodec.encode(id, comp, predictor2 = true)
      val img = TiffCodec.decode(ours)
      val plain = TiffCodec.decode(TiffCodec.encode(id))
      assert(img.px.toSeq == plain.px.toSeq,
        s"predictor-2 comp=$comp mismatch id=$id")
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ours))
      assert(javaImg != null, s"ImageIO rejected predictor-2 id=$id")
      for { y <- 0 until img.h; x <- 0 until img.w } {
        val rgb = javaImg.getRGB(x, y)
        assert((rgb >> 16 & 0xFF, rgb >> 8 & 0xFF, rgb & 0xFF) ==
          BmpCodec.pixel(id, x, y),
          s"ImageIO predictor-2 comp=$comp id=$id ($x,$y)")
      }
    }
    // direction 2: ImageIO-ENCODED LZW and Deflate decode under ours
    for (id <- Seq(0L, 7L); comp <- Seq("LZW", "ZLib")) {
      val (w, h) = BmpCodec.dims(id)
      val buf = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for { y <- 0 until h; x <- 0 until w } {
        val (r, g, b) = BmpCodec.pixel(id, x, y)
        buf.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
        .next()
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(comp)
      val out = new java.io.ByteArrayOutputStream
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(buf, null, null), p)
      ios.close()
      val img = TiffCodec.decode(out.toByteArray)
      assert(img.w == w && img.h == h)
      for { y <- 0 until h; x <- 0 until w } {
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) ==
          BmpCodec.pixel(id, x, y),
          s"our decode of ImageIO $comp id=$id ($x,$y)")
      }
    }
    // LZW property: arbitrary buffers round-trip, including ones long
    // enough to force width growth past 10 and 11 bits and a table
    // reset (4094-entry Clear)
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 30) {
      val raw = new Array[Byte](rnd.nextInt(30000) + 1)
      var i = 0
      while (i < raw.length) {
        val v = rnd.nextInt(if (trial % 2 == 0) 4 else 256).toByte
        val run = math.min(rnd.nextInt(50) + 1, raw.length - i)
        java.util.Arrays.fill(raw, i, i + run, v)
        i += run
      }
      val back = TiffCodec.lzwDecode(TiffCodec.lzwEncode(raw), raw.length)
      assert(back.toSeq == raw.toSeq, s"LZW round-trip trial $trial")
    }
  }

  test("MP4 moov walk: every metadata field round-trips the formulas, " +
      "largesize boxes parse, and malformed/bomb boxes reject") {
    import graft.operators.Multimodal.Mp4Codec
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 7L, 12L, 899L, 1234L)) {
      val bytes = Mp4Codec.encode(id)
      val m = Mp4Codec.meta(bytes)
      val (w, h) = Mp4Codec.dims(id)
      assert(m.durationMs == Mp4Codec.durationMs(id), s"dur id=$id")
      assert(m.tracks == Mp4Codec.trackCount(id), s"tracks id=$id")
      assert(m.vCodec == Mp4Codec.videoCodec(id) && m.w == w && m.h == h,
        s"video id=$id: $m")
      assert(m.aCodec == "mp4a" && m.aRate == Mp4Codec.audioRate(id),
        s"audio id=$id: $m")
    }
    // 64-bit largesize framing: re-wrap the mdat with size=1 + largesize
    val plain = Mp4Codec.encode(5L)
    def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val mdatAt = {
      var off = 0
      while (new String(plain, off + 4, 4, "US-ASCII") != "mdat")
        off += ((plain(off) & 0xFF) << 24) | ((plain(off + 1) & 0xFF) << 16) |
          ((plain(off + 2) & 0xFF) << 8) | (plain(off + 3) & 0xFF)
      off
    }
    val mdatSize = ((plain(mdatAt) & 0xFF) << 24) |
      ((plain(mdatAt + 1) & 0xFF) << 16) |
      ((plain(mdatAt + 2) & 0xFF) << 8) | (plain(mdatAt + 3) & 0xFF)
    val wrapped = plain.take(mdatAt) ++
      be32(1) ++ "mdat".getBytes("US-ASCII") ++ be32(0) ++
      be32(mdatSize + 8L) ++ plain.slice(mdatAt + 8, plain.length)
    assert(Mp4Codec.meta(wrapped) == Mp4Codec.meta(plain))
    // a box claiming to overrun its parent rejects
    val overrun = plain.clone()
    overrun(0) = 0x7F.toByte // ftyp size becomes enormous
    intercept[Exception] { Mp4Codec.meta(overrun) }
    // truncation rejects
    intercept[Exception] {
      Mp4Codec.meta(java.util.Arrays.copyOf(plain, plain.length / 2))
    }
    // nesting bomb: 20 levels of nested moov boxes
    var bomb = be32(16) ++ "ftypisom".getBytes("US-ASCII") ++ be32(0)
    var inner = be32(8) ++ "moov".getBytes("US-ASCII")
    for (_ <- 0 until 20)
      inner = be32(inner.length + 8L) ++ "moov".getBytes("US-ASCII") ++ inner
    intercept[Exception] { Mp4Codec.meta(bomb ++ inner) }
  }

  test("MP4 sample tables: stts/stsz/stsc/stco/co64/stss round-trip " +
      "the formulas; fragmented MP4 rejects; lying tables reject") {
    import graft.operators.Multimodal.Mp4Codec
    for (id <- Seq(0L, 1L, 2L, 7L, 47L, 99L, 148L, 899L, 12345L)) {
      val m = Mp4Codec.sampleMeta(Mp4Codec.encode(id))
      val n = Mp4Codec.vSampleCount(id)
      assert(m.vSamples == n, s"vSamples id=$id")
      assert(m.vBytes == (0 until n)
        .map(k => Mp4Codec.vSampleSize(id, k).toLong).sum,
        s"vBytes id=$id")
      assert(m.vKeyframes == Mp4Codec.vKeyframeCount(id) &&
        m.vChunks == Mp4Codec.vChunkCount(id), s"video tables id=$id")
      assert(m.aSamples == Mp4Codec.aSampleCount(id) &&
        m.aBytes == Mp4Codec.aSampleSize(id).toLong *
          Mp4Codec.aSampleCount(id) &&
        m.aChunks == Mp4Codec.aChunkCount(id), s"audio tables id=$id")
      // the co64 offset really came through the 64-bit path
      assert(m.aFirstOffset == Mp4Codec.ChunkBase64 &&
        m.aFirstOffset > (1L << 32), s"co64 id=$id")
    }
    def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    // a moof box anywhere -> explicit fragmented-MP4 rejection
    val frag = Mp4Codec.encode(3L) ++
      be32(8) ++ "moof".getBytes("US-ASCII")
    val ex = intercept[Exception] { Mp4Codec.sampleMeta(frag) }
    assert(ex.getMessage.contains("fragmented"), ex.getMessage)
    // a lying stsz (count != stts total) rejects: flip the stsz
    // sample_count of the video track
    val plain = Mp4Codec.encode(3L)
    val stszAt = {
      var i = 0
      while (new String(plain, i, 4, "US-ASCII") != "stsz") i += 1
      i - 4 // box start
    }
    val lying = plain.clone()
    // full box: size(4) type(4) verflags(4) sample_size(4) count(4)
    val countAt = stszAt + 16
    lying(countAt + 3) = (lying(countAt + 3) + 1).toByte
    intercept[Exception] { Mp4Codec.sampleMeta(lying) }
  }

  test("MP4 edit lists: the empty-edit lead and presentation duration " +
      "round-trip the formulas; version-1 elst and entry bombs reject") {
    import graft.operators.Multimodal.Mp4Codec
    for (id <- Seq(0L, 1L, 6L, 7L, 13L, 899L)) {
      val e = Mp4Codec.editList(Mp4Codec.encode(id))
      assert(e.entries == 2, s"entries id=$id")
      assert(e.leadMs == Mp4Codec.editLeadMs(id), s"lead id=$id")
      assert(e.presentationMs == Mp4Codec.editPresentationMs(id),
        s"presentation id=$id")
      // the sample walk is undisturbed by the edts sibling
      assert(Mp4Codec.sampleMeta(Mp4Codec.encode(id)).vSamples ==
        Mp4Codec.vSampleCount(id))
    }
    // corrupt the elst version byte -> explicit rejection
    val plain = Mp4Codec.encode(3L)
    val elstAt = {
      var i = 0
      while (new String(plain, i, 4, "US-ASCII") != "elst") i += 1
      i - 4
    }
    val v1 = plain.clone()
    v1(elstAt + 8) = 1 // version 1 (64-bit entries we don't emit)
    intercept[Exception] { Mp4Codec.editList(v1) }
    // an implausible entry count rejects before reading entries
    val bomb = plain.clone()
    bomb(elstAt + 12) = 0x7F.toByte // entry_count high byte
    intercept[Exception] { Mp4Codec.editList(bomb) }
  }

  test("TIFF decompression-bomb headers reject before allocating") {
    import graft.operators.Multimodal.TiffCodec
    // a hand-built 46-byte little-endian TIFF declaring 25000x25000:
    // each dim passes the per-dim cap, but the total would be a
    // 1.9 GB pixel buffer — the bound must fire before any allocation
    val o = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF) }
    def u32(v: Long): Unit = { u16((v & 0xFFFF).toInt)
      u16(((v >> 16) & 0xFFFF).toInt) }
    o.write('I'); o.write('I'); u16(42); u32(8)
    u16(2) // two IFD entries
    u16(256); u16(4); u32(1); u32(25000L) // ImageWidth
    u16(257); u16(4); u32(1); u32(25000L) // ImageLength
    u32(0)
    val ex = intercept[Exception] { TiffCodec.decode(o.toByteArray) }
    assert(ex.getMessage.contains("64M-pixel"), ex.getMessage)
  }

  test("TIFF rejects malformed input, not misparses") {
    import graft.operators.Multimodal.TiffCodec
    val good = TiffCodec.encode(6L)
    intercept[Exception] { TiffCodec.decode(good.take(40)) } // truncated
    intercept[Exception] { TiffCodec.decode("garbage!".getBytes) }
    // strip offset pointing past EOF
    val bad = good.clone()
    // flip a bit inside the IFD area (last 200 bytes hold the arrays
    // and entries); the parser must throw, never return wrong pixels
    var rejectedOrExact = true
    for (k <- good.length - 118 until good.length - 110) {
      val mut = good.clone()
      mut(k) = (mut(k) ^ 0x40).toByte
      try {
        val img = TiffCodec.decode(mut)
        // a surviving parse must still be internally consistent
        rejectedOrExact &&= (img.px.length == img.w * img.h * 3)
      } catch { case _: Exception => () }
    }
    assert(rejectedOrExact)
    assert(bad.length == good.length)
  }

  test("Adam7 interlaced PNG decodes byte-identically to sequential " +
      "across all dims residues") {
    import graft.operators.Multimodal.PngCodec
    // 0 until 91*3 by 3 covers every (w,h) = (16+id%13, 12+id%7) combo
    // (id % 3 == 0 ids are the PNG rows in the battery)
    for (id <- 0L until 273L by 3L) {
      val seq = PngCodec.decode(PngCodec.encode(id))
      val il = PngCodec.decode(PngCodec.encodeInterlaced(id))
      assert(il.w == seq.w && il.h == seq.h, s"id=$id dims")
      assert(java.util.Arrays.equals(il.px, seq.px), s"id=$id pixels")
    }
  }

  test("Adam7 interlaced PNG parses under ImageIO and our decoder " +
      "reads ImageIO-written interlaced files") {
    import graft.operators.Multimodal.PngCodec
    for (id <- Seq(0L, 3L, 42L, 255L)) {
      val (w, h) = BmpCodec.dims(id)
      // direction 1: our interlaced wire format under the JDK's decoder
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(PngCodec.encodeInterlaced(id)))
      assert(javaImg != null, s"ImageIO rejected interlaced PNG id=$id")
      assert(javaImg.getWidth == w && javaImg.getHeight == h)
      for { y <- 0 until h; x <- 0 until w } {
        val rgb = javaImg.getRGB(x, y)
        assert((rgb >> 16 & 0xFF, rgb >> 8 & 0xFF, rgb & 0xFF) ==
          BmpCodec.pixel(id, x, y), s"ImageIO interlaced id=$id ($x,$y)")
      }
    }
  }

  test("corrupt interlaced PNG rejects cleanly") {
    import graft.operators.Multimodal.PngCodec
    val good = PngCodec.encodeInterlaced(6L)
    val bad = good.clone()
    bad(good.length - 20) = (bad(good.length - 20) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decode(bad))
    assert(e.getMessage.contains("CRC"))
    intercept[IllegalArgumentException](PngCodec.decode(good.take(60)))
  }

  test("animated GIF: frame 0 equals the static decode; compositing " +
      "matches a direct canvas re-derivation") {
    import graft.operators.Multimodal.GifCodec
    for (id <- Seq(1L, 4L, 43L, 256L, 997L)) {
      val frames = GifCodec.decodeFrames(GifCodec.encodeAnimated(id))
      assert(frames.length == GifCodec.nFrames(id))
      // frame 0 is the full canvas with the static formula
      val static = GifCodec.decode(GifCodec.encode(id))
      // dims formulas differ only in content via palIdx(id,..) — same
      val (w, h) = GifCodec.dims(id)
      assert(frames.head._1.w == w && frames.head._1.h == h)
      assert(java.util.Arrays.equals(frames.head._1.px, static.px),
        s"id=$id frame0 vs static")
      // delays carried from each GCE
      frames.zipWithIndex.foreach { case ((_, d), f) =>
        assert(d == 10 + f, s"id=$id delay frame $f")
      }
      // direct composite: governing frame per pixel
      frames.zipWithIndex.foreach { case ((img, _), f) =>
        for { y <- 0 until h; x <- 0 until w } {
          val g = (1 to f).reverse.find { g =>
            val (x0, y0, wf, hf) = GifCodec.frameRect(id, g)
            x >= x0 && x < x0 + wf && y >= y0 && y < y0 + hf
          }.getOrElse(0)
          val c = GifCodec.palIdx(id + 131L * g, x, y)
          assert((img.r(x, y), img.g(x, y), img.b(x, y)) ==
            GifCodec.pal(c), s"id=$id f=$f ($x,$y) governing $g")
        }
      }
    }
  }

  test("animated GIF parses under ImageIO with the right frame count") {
    import graft.operators.Multimodal.GifCodec
    for (id <- Seq(1L, 43L)) {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(GifCodec.encodeAnimated(id)))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      assert(readers.hasNext, s"ImageIO has no reader for id=$id")
      val r = readers.next()
      r.setInput(in)
      assert(r.getNumImages(true) == GifCodec.nFrames(id), s"id=$id")
      r.dispose()
    }
  }

  test("malformed animated GIFs reject cleanly") {
    import graft.operators.Multimodal.GifCodec
    val good = GifCodec.encodeAnimated(4L)
    intercept[IllegalArgumentException](
      GifCodec.decodeFrames(good.take(good.length / 2)))
    // disposal method 2 (restore-to-background) is out of scope and
    // must reject, not silently mis-composite
    val bad = good.clone()
    val gce = {  // first GCE packed byte: after header+GCT+NETSCAPE ext
      var i = 13 + 768
      while (!((bad(i) & 0xFF) == 0x21 && (bad(i + 1) & 0xFF) == 0xF9))
        i += 1
      i + 3
    }
    bad(gce) = (2 << 2).toByte
    val e = intercept[IllegalArgumentException](GifCodec.decodeFrames(bad))
    assert(e.getMessage.contains("disposal"))
  }

  test("PNG tEXt: extraction matches the fixture formulas; strip " +
      "reproduces the pre-splice PNG byte-identically; ImageIO still " +
      "reads the spliced file") {
    import graft.operators.Multimodal.PngCodec
    for (id <- Seq(0L, 1L, 2L, 3L, 701L)) {
      val b = PngCodec.encodeWithText(id)
      val kv = PngCodec.textChunks(b).toMap
      assert(kv("Author") == PngCodec.authorOf(id))
      assert(kv("Software") == PngCodec.softwareOf(id))
      assert(kv.get("Location").isDefined == PngCodec.hasLocation(id))
      // interop: the JDK's independent codec accepts the spliced file
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b))
      assert(img != null && img.getWidth == BmpCodec.dims(id)._1)
      // strip: byte-identical to the PNG before the splice
      val clean = PngCodec.stripText(b)
      assert(PngCodec.textChunks(clean).isEmpty)
      assert(java.util.Arrays.equals(clean, PngCodec.encode(id)),
        s"strip must reproduce the pre-splice PNG exactly for $id")
      // a corrupted tEXt chunk fails the CRC check loudly
      val corrupt = b.clone()
      corrupt(8 + 12 + 13 + 9) = (corrupt(8 + 12 + 13 + 9) ^ 0x1).toByte
      intercept[IllegalArgumentException](PngCodec.textChunks(corrupt))
    }
  }

  test("PNG chunk corruption is caught by CRC, not misparsed") {
    import graft.operators.Multimodal.PngCodec
    val good = PngCodec.encode(6L)
    // flip one pixel-data byte inside IDAT: without CRC checking this
    // would decode to silently wrong pixels
    val bad = good.clone()
    bad(good.length - 20) = (bad(good.length - 20) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decode(bad))
    assert(e.getMessage.contains("CRC"))
    intercept[IllegalArgumentException](PngCodec.decode(good.take(40)))
    intercept[IllegalArgumentException](
      PngCodec.decode("not a png at all".getBytes))
  }

  test("PNG decompression bomb: valid-CRC huge dims rejected before allocation") {
    import graft.operators.Multimodal.PngCodec
    // a CRC-valid crafted header the byte-mutation fuzz can never
    // produce: tiny file, enormous declared dims. Unguarded, the raw
    // scanline buffer h*(1+w*3) overflows Int (65535 x 65535) or
    // allocates gigabytes (20000 x 20000) before any inflate happens.
    def crafted(w: Int, h: Int): Array[Byte] = {
      def be32(v: Int) = Array(
        (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
        val t = tag.getBytes("US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(t); crc.update(data)
        be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
      }
      val sig = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
        '\r'.toByte, '\n'.toByte, 0x1A.toByte, '\n'.toByte)
      sig ++ chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)) ++
        chunk("IDAT", Array[Byte](1, 2, 3)) ++ chunk("IEND", Array.empty)
    }
    for ((w, h) <- Seq((65535, 65535), (20000, 20000))) {
      val e = intercept[IllegalArgumentException](PngCodec.decode(crafted(w, h)))
      assert(e.getMessage.contains("bound"), s"${w}x$h: ${e.getMessage}")
    }
  }

  test("fuzz: all decoders reject junk with a clean error") {
    import graft.operators.Multimodal.{AviCodec, PngCodec, PpmCodec, WavCodec}
    import graft.operators.JpegCodec
    val rnd = new scala.util.Random(20260813)
    val decoders = Seq[Array[Byte] => Any](
      BmpCodec.decode, PpmCodec.decode, WavCodec.decode, AviCodec.decode,
      PngCodec.decode, JpegCodec.decode)
    val seeds = Seq(BmpCodec.encode(5L), PpmCodec.encode(5L),
      WavCodec.encode(5L), AviCodec.encode(5L), PngCodec.encode(5L),
      JpegCodec.encode(5L))
    for (_ <- 0 until 500; dec <- decoders) {
      // half pure-random, half a valid container with mutated bytes —
      // the contract is IllegalArgumentException or a decode, never an
      // index error, NegativeArraySize, stack overflow, or hang
      val input: Array[Byte] =
        if (rnd.nextBoolean()) {
          val b = new Array[Byte](rnd.nextInt(300))
          rnd.nextBytes(b)
          b
        } else {
          val b = seeds(rnd.nextInt(seeds.length)).clone()
          for (_ <- 0 to rnd.nextInt(8))
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          b
        }
      try dec(input)
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("crafted near-Int.MaxValue size fields are rejected cleanly") {
    import graft.operators.Multimodal.{AviCodec, WavCodec}
    def patchLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
      b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
    }
    // WAV data-chunk size near Int.MaxValue: the Int sum would wrap
    val wav = WavCodec.encode(3L)
    patchLe32(wav, 40, 0x7FFFFFF0)
    intercept[IllegalArgumentException](WavCodec.decode(wav))
    // AVI LIST size with the same wraparound
    val avi = AviCodec.encode(3L)
    patchLe32(avi, 16, 0x7FFFFFF0)
    intercept[IllegalArgumentException](AviCodec.decode(avi))
    // BMP with a negative pixel-data offset
    val bmp = BmpCodec.encode(3L)
    patchLe32(bmp, 10, 0x80000036.toInt)
    intercept[IllegalArgumentException](BmpCodec.decode(bmp))
  }

  test("header-only parses agree with full decode and reject garbage") {
    import graft.operators.Multimodal.{AviCodec, BmpCodec}
    for (id <- 0L to 12L) {
      val avi = AviCodec.encode(id)
      val full = AviCodec.decode(avi)
      assert(AviCodec.header(avi) == ((full.w, full.h, full.frames.length)))
      val bmp = BmpCodec.encode(id)
      val img = BmpCodec.decode(bmp)
      assert(BmpCodec.headerDims(bmp) == ((img.w, img.h)))
    }
    intercept[IllegalArgumentException](
      AviCodec.header(Array[Byte](1, 2, 3, 4)))
    intercept[IllegalArgumentException](
      BmpCodec.headerDims(Array[Byte]('B', 'M', 0)))
  }

  test("header() accepts many SIBLING lists and bounds chunks by their " +
       "enclosing list (round-8 ADVICE)") {
    import graft.operators.Multimodal.AviCodec
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def tag(s: String) = s.getBytes("US-ASCII")
    // 20 empty INFO lists spliced before hdrl: a realistic flat layout
    // (strl/INFO/odml/rec lists are SIBLINGS, not nesting) that the
    // pre-round-8 linear walk miscounted as depth 20 and rejected
    val base = AviCodec.encode(4L)
    val full = AviCodec.decode(base)
    val info = tag("LIST") ++ le32(4) ++ tag("INFO")
    val spliced = base.take(12) ++ Array.fill(20)(info).flatten ++ base.drop(12)
    assert(AviCodec.header(spliced) == ((full.w, full.h, full.frames.length)))
    assert(AviCodec.decode(spliced).frames.length == full.frames.length)
    // an avih overflowing its ENCLOSING hdrl list while staying inside
    // the file must be rejected — the old walk only checked the file end
    val inner = tag("avih") ++ le32(300) ++ Array.fill[Byte](8)(0)
    val lst = tag("LIST") ++ le32(4 + inner.length) ++ tag("hdrl") ++ inner
    val fileBody = tag("AVI ") ++ lst ++ Array.fill[Byte](400)(0)
    val bad = tag("RIFF") ++ le32(fileBody.length) ++ fileBody
    val e = intercept[IllegalArgumentException](AviCodec.header(bad))
    assert(e.getMessage.contains("truncated chunk avih"))
  }

  test("malformed WAV is rejected, not misparsed") {
    import graft.operators.Multimodal.WavCodec
    intercept[IllegalArgumentException](WavCodec.decode(Array[Byte](1, 2)))
    val notWave = WavCodec.encode(3L)
    notWave(8) = 'X'
    intercept[IllegalArgumentException](WavCodec.decode(notWave))
    val truncated = WavCodec.encode(3L).take(100)
    intercept[IllegalArgumentException](WavCodec.decode(truncated))
  }

  // ---------------------------------------------------------------- GIF

  import graft.operators.Multimodal.GifCodec

  test("GIF roundtrip reproduces the synthesis formula") {
    for (id <- Seq(0L, 1L, 7L, 90L, 12345L)) {
      val img = GifCodec.decode(GifCodec.encode(id))
      val (w, h) = GifCodec.dims(id)
      assert(img.w == w && img.h == h)
      for { y <- 0 until h; x <- 0 until w } {
        val expect = GifCodec.pal(GifCodec.palIdx(id, x, y))
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) == expect,
          s"id=$id ($x,$y)")
      }
    }
  }

  test("GIF cross-checks against the JDK's independent ImageIO codec") {
    for (id <- Seq(0L, 5L, 42L, 666L)) {
      // direction 1: our LZW stream must decode under ImageIO — a
      // width-growth or sub-block framing bug on the encode side fails
      // here even if our own decoder mirrors the same bug
      val ours = GifCodec.encode(id)
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ours))
      assert(javaImg != null, s"ImageIO rejected our GIF for id=$id")
      val (w, h) = GifCodec.dims(id)
      assert(javaImg.getWidth == w && javaImg.getHeight == h)
      for { y <- 0 until h; x <- 0 until w } {
        val rgb = javaImg.getRGB(x, y)
        assert((rgb >> 16 & 0xFF, rgb >> 8 & 0xFF, rgb & 0xFF) ==
          GifCodec.pal(GifCodec.palIdx(id, x, y)),
          s"ImageIO read id=$id ($x,$y)")
      }
      // direction 2: ImageIO's own GIF writer (independent LZW encoder,
      // its own palette layout) must decode identically under our parser
      val buf = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      for { y <- 0 until h; x <- 0 until w } {
        val (r, g, b) = GifCodec.pal(GifCodec.palIdx(id, x, y))
        buf.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val out = new java.io.ByteArrayOutputStream
      assert(javax.imageio.ImageIO.write(buf, "gif", out))
      val img = GifCodec.decode(out.toByteArray)
      assert(img.w == w && img.h == h)
      // indexed BufferedImage quantizes to ITS palette; compare to what
      // ImageIO itself stored, read back via a second ImageIO pass, so
      // the check is decoder-vs-decoder on identical bytes
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(out.toByteArray))
      for { y <- 0 until h; x <- 0 until w } {
        val rgb = ref.getRGB(x, y)
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) ==
          ((rgb >> 16 & 0xFF, rgb >> 8 & 0xFF, rgb & 0xFF)),
          s"our decode of ImageIO id=$id ($x,$y)")
      }
    }
  }

  test("GIF LZW survives a dictionary-overflow reset (4096 entries)") {
    // high-entropy indices defeat phrase reuse, forcing ~1 table add
    // per pixel: 6000 pixels guarantees the 4096 reset fires in
    // lzwCompress and the CLEAR mid-stream path runs in lzwDecompress
    val n = 6000
    val pixels = Array.tabulate(n) { i =>
      (i * 2654435761L % 251).toInt // pseudo-random, not periodic
    }
    val data = GifCodec.lzwCompress(pixels, 8)
    val back = GifCodec.lzwDecompress(data, 8, n)
    assert(back.sameElements(pixels))
  }

  test("GIF LZW round-trips random streams at every min code size") {
    // regression first: the final data code's decoder-side add landing
    // exactly on a width boundary, with EOI byte-aligned — before the
    // encoder mirrored the decoder's last growth this lost EOI past the
    // stream end (~0.3% of random streams)
    val corner = Array(1, 2, 3, 2, 1, 1, 0, 3, 0, 1, 1, 1)
    assert(GifCodec.lzwDecompress(
      GifCodec.lzwCompress(corner, 2), 2, corner.length)
      .sameElements(corner))
    val rnd = new scala.util.Random(8)
    for (_ <- 1 to 2000) {
      val mcs = 2 + rnd.nextInt(7) // 2..8
      val n = 1 + rnd.nextInt(800)
      val pixels = Array.fill(n)(rnd.nextInt(1 << mcs))
      val back = GifCodec.lzwDecompress(
        GifCodec.lzwCompress(pixels, mcs), mcs, n)
      assert(back.sameElements(pixels), s"mcs=$mcs n=$n")
    }
  }

  test("GIF rejects malformed input, not misparses") {
    intercept[IllegalArgumentException](GifCodec.decode(Array[Byte](1)))
    val notGif = GifCodec.encode(3L); notGif(3) = '7' // "GIF7.."
    intercept[IllegalArgumentException](GifCodec.decode(notGif))
    val truncated = GifCodec.encode(3L)
    intercept[IllegalArgumentException](
      GifCodec.decode(truncated.take(truncated.length - 30)))
    // declared dims larger than the LZW stream delivers
    val lied = GifCodec.encode(3L)
    // image descriptor height at offset 6+7+768+5+2: bump it
    val ihOff = 13 + 768 + 5 + 2
    lied(ihOff) = (lied(ihOff) + 1).toByte
    intercept[IllegalArgumentException](GifCodec.decode(lied))
  }

  // ------------------------------------------------------------------
  // JPEG
  // ------------------------------------------------------------------
  import graft.operators.JpegCodec

  test("JPEG roundtrip reproduces the coefficient-space formula " +
      "bit-exactly") {
    // dims cycle with period lcm(14,11)=154 — cover every combination,
    // so every partial-MCU geometry and DC-diff/AC-run mix is hit
    for (id <- 0L until 154L) {
      val (w, h) = JpegCodec.dims(id)
      val img = JpegCodec.decode(JpegCodec.encode(id))
      assert(img.w == w && img.h == h, s"id=$id dims")
      for { y <- 0 until h; x <- 0 until w } {
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) ==
          JpegCodec.expectedRgb(id, x, y), s"id=$id ($x,$y)")
      }
    }
  }

  test("JPEG cross-checks against the JDK's independent ImageIO codec") {
    // direction 1: ImageIO (libjpeg-backed) must accept our bitstream
    // and reconstruct the same image up to decoder freedom. Two layers:
    // (a) where no channel clamps, the RGB→Y recovery
    // 0.299R+0.587G+0.114B inverts the color transform exactly, so
    // luma — never subsampled — is pinned within IDCT freedom at EVERY
    // such pixel; (b) full RGB is compared away from MCU borders, where
    // libjpeg's fancy chroma upsampling legitimately blends our
    // per-MCU-constant chroma across the boundary (clamped pixels lose
    // chroma information irreversibly, so (a) skips them).
    for (id <- Seq(0L, 7L, 42L, 153L)) {
      val ours = JpegCodec.encode(id)
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ours))
      assert(javaImg != null, s"ImageIO rejected our JPEG for id=$id")
      val (w, h) = JpegCodec.dims(id)
      assert(javaImg.getWidth == w && javaImg.getHeight == h)
      var rgbChecked = 0
      for { y <- 0 until h; x <- 0 until w } {
        val rgb = javaImg.getRGB(x, y)
        val (r, g, b) = (rgb >> 16 & 0xFF, rgb >> 8 & 0xFF, rgb & 0xFF)
        val (er, eg, eb) = JpegCodec.expectedRgb(id, x, y)
        val unclamped = Seq(er, eg, eb).forall(v => v >= 2 && v <= 253)
        if (unclamped) {
          val yRec = 0.299 * r + 0.587 * g + 0.114 * b
          val yExp = JpegCodec.lumaAt(id, x, y)
          assert(math.abs(yRec - yExp) <= 2.5,
            s"ImageIO luma id=$id ($x,$y): $yRec vs $yExp")
        }
        if (x % 16 >= 4 && x % 16 <= 11 && y % 16 >= 4 && y % 16 <= 11) {
          assert(math.abs(r - er) <= 3 && math.abs(g - eg) <= 3 &&
            math.abs(b - eb) <= 3,
            s"ImageIO rgb id=$id ($x,$y): ($r,$g,$b) vs ($er,$eg,$eb)")
          rgbChecked += 1
        }
      }
      // the interior comparison must have real coverage, not vacuity
      assert(rgbChecked >= 64, s"id=$id compared only $rgbChecked px")
    }
    // direction 2: a JPEG produced by ImageIO's own encoder (its own
    // quant tables, Huffman choices, subsampling decisions) must decode
    // under our general baseline parser to what ImageIO itself reads
    // back — up to IDCT freedom and our nearest- vs libjpeg's fancy
    // upsampling, kept small by a smooth gradient image.
    val (gw, gh) = (40, 28)
    val buf = new java.awt.image.BufferedImage(
      gw, gh, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for { y <- 0 until gh; x <- 0 until gw } {
      val r = 40 + 3 * x + y
      val g = 200 - 2 * x - y
      val b = 70 + x + 2 * y
      buf.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(buf, "jpg", out))
    val foreign = out.toByteArray
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(foreign))
    val img = JpegCodec.decode(foreign)
    assert(img.w == ref.getWidth && img.h == ref.getHeight)
    var sumDiff = 0L
    var maxDiff = 0
    for { y <- 0 until img.h; x <- 0 until img.w } {
      val rgb = ref.getRGB(x, y)
      val ds = Seq(
        math.abs(img.r(x, y) - (rgb >> 16 & 0xFF)),
        math.abs(img.g(x, y) - (rgb >> 8 & 0xFF)),
        math.abs(img.b(x, y) - (rgb & 0xFF)))
      sumDiff += ds.sum
      maxDiff = math.max(maxDiff, ds.max)
    }
    val meanDiff = sumDiff.toDouble / (img.w * img.h * 3)
    assert(maxDiff <= 8, s"max channel diff $maxDiff vs ImageIO")
    assert(meanDiff <= 2.0, s"mean channel diff $meanDiff vs ImageIO")
    // grayscale leg: single-component JPEGs take the nComp==1 path
    val gray = new java.awt.image.BufferedImage(
      24, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for { y <- 0 until 16; x <- 0 until 24 }
      gray.getRaster.setSample(x, y, 0, 30 + 5 * x + 3 * y)
    val gout = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(gray, "jpg", gout))
    val gimg = JpegCodec.decode(gout.toByteArray)
    val gref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gout.toByteArray))
    assert(gimg.w == 24 && gimg.h == 16)
    for { y <- 0 until 16; x <- 0 until 24 } {
      // raw raster sample — getRGB on TYPE_BYTE_GRAY applies a
      // gray→sRGB gamma conversion that has nothing to do with JPEG
      val want = gref.getRaster.getSample(x, y, 0)
      assert(math.abs(gimg.r(x, y) - want) <= 2 &&
        gimg.r(x, y) == gimg.g(x, y) && gimg.g(x, y) == gimg.b(x, y),
        s"gray ($x,$y): ours=${gimg.r(x, y)} ref=$want")
    }
  }

  test("JPEG restart markers (DRI/RSTn) roundtrip with DC resets") {
    // camera JPEGs emit restart markers for error resilience; the
    // decoder must byte-align, consume RST0..7 modulo-8, and reset DC
    // predictors at every interval — any slip corrupts all later DCs
    for (id <- Seq(0L, 7L, 42L, 153L); ri <- 1 to 3) {
      val bytes = JpegCodec.encode(id, restartInterval = ri)
      val (w, h) = JpegCodec.dims(id)
      val nMcus = ((w + 15) / 16) * ((h + 15) / 16)
      // the stream must actually contain restart markers whenever the
      // MCU count crosses the interval
      val nRst = bytes.sliding(2).count(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) >= 0xD0 &&
          (p(1) & 0xFF) <= 0xD7)
      assert(nRst == (nMcus - 1) / ri,
        s"id=$id ri=$ri: $nRst RSTn markers for $nMcus MCUs")
      val img = JpegCodec.decode(bytes)
      assert(img.w == w && img.h == h)
      for { y <- 0 until h; x <- 0 until w } {
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) ==
          JpegCodec.expectedRgb(id, x, y), s"id=$id ri=$ri ($x,$y)")
      }
      // ImageIO (libjpeg) must also accept the restart-marker stream
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(javaImg != null && javaImg.getWidth == w,
        s"ImageIO rejected restart-marker JPEG id=$id ri=$ri")
    }
  }

  test("JPEG general-pixel encoder roundtrips within JPEG loss bounds " +
      "and interops with ImageIO") {
    // encodePixels is the arbitrary-pixel companion to the coefficient-
    // space fixture encoder: JFIF color transform, 4:2:0 box
    // downsample, FDCT, quality-scaled Annex K quantization. Lossy by
    // nature — the checks bound the error on a smooth image and verify
    // the stream under both our decoder and ImageIO.
    val (w, h) = (45, 30) // partial MCUs both axes
    val px = new Array[Byte](w * h * 3)
    for { y <- 0 until h; x <- 0 until w } {
      px((y * w + x) * 3) = (40 + 3 * x + y).toByte
      px((y * w + x) * 3 + 1) = (200 - 2 * x - y).toByte
      px((y * w + x) * 3 + 2) = (70 + x + 2 * y).toByte
    }
    val src = BmpCodec.Image(w, h, px)
    for (quality <- Seq(70, 85, 95)) {
      val bytes = JpegCodec.encodePixels(src, quality)
      val img = JpegCodec.decode(bytes)
      assert(img.w == w && img.h == h, s"q=$quality dims")
      var maxD = 0
      var sumD = 0L
      for { y <- 0 until h; x <- 0 until w } {
        val ds = Seq(math.abs(img.r(x, y) - src.r(x, y)),
          math.abs(img.g(x, y) - src.g(x, y)),
          math.abs(img.b(x, y) - src.b(x, y)))
        maxD = math.max(maxD, ds.max)
        sumD += ds.sum
      }
      val meanD = sumD.toDouble / (w * h * 3)
      // smooth gradient: quantization + 4:2:0 loss stays small, and
      // higher quality must not be worse on average
      assert(maxD <= 12, s"q=$quality max diff $maxD")
      assert(meanD <= 3.0, s"q=$quality mean diff $meanD")
      // the stream is a legal JPEG to the independent decoder too
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(javaImg != null, s"ImageIO rejected encodePixels q=$quality")
      assert(javaImg.getWidth == w && javaImg.getHeight == h)
      var maxJ = 0
      for { y <- 0 until h; x <- 0 until w } {
        val rgb = javaImg.getRGB(x, y)
        maxJ = math.max(maxJ, Seq(
          math.abs((rgb >> 16 & 0xFF) - img.r(x, y)),
          math.abs((rgb >> 8 & 0xFF) - img.g(x, y)),
          math.abs((rgb & 0xFF) - img.b(x, y))).max)
      }
      // same bitstream, two decoders: only IDCT/upsampling freedom
      assert(maxJ <= 8, s"q=$quality decoder divergence $maxJ")
    }
    // saturated random noise must still produce a legal stream (the
    // AC-magnitude clamp path) that both decoders accept
    val rnd = new scala.util.Random(42)
    val noisy = new Array[Byte](w * h * 3)
    rnd.nextBytes(noisy)
    val nb = JpegCodec.encodePixels(BmpCodec.Image(w, h, noisy), 100)
    assert(JpegCodec.decode(nb).w == w)
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(nb)) != null)
  }

  test("JPEG 16-bit (Pq=1) DQT tables parse identically to 8-bit") {
    // splice the 8-bit DQT segment out and re-express the same tables
    // at 16-bit precision — the decoder's Pq=1 branch must produce the
    // exact same image
    val orig = JpegCodec.encode(9L)
    val dqtOff = findMarker(orig, 0xDB)
    val len = ((orig(dqtOff + 2) & 0xFF) << 8) | (orig(dqtOff + 3) & 0xFF)
    val after = dqtOff + 2 + len
    val nt = new java.io.ByteArrayOutputStream
    nt.write(orig, 0, dqtOff)
    nt.write(0xFF); nt.write(0xDB)
    val nlen = 2 + 2 * 129
    nt.write(nlen >>> 8); nt.write(nlen & 0xFF)
    for (t <- 0 until 2) {
      nt.write(0x10 | t) // Pq=1, table id t
      for (_ <- 0 until 64) { nt.write(0); nt.write(8) } // same all-8s
    }
    nt.write(orig, after, orig.length - after)
    val a = JpegCodec.decode(orig)
    val b = JpegCodec.decode(nt.toByteArray)
    assert(a.w == b.w && a.h == b.h)
    assert(a.px.sameElements(b.px),
      "Pq=1 tables must decode bit-identically to Pq=0")
  }

  test("JPEG rejects malformed input, not misparses") {
    intercept[IllegalArgumentException](
      JpegCodec.decode("definitely not a jpeg".getBytes))
    intercept[IllegalArgumentException](JpegCodec.decode(Array[Byte](1)))
    val good = JpegCodec.encode(5L)
    // truncations at every structural boundary: marker walk, segment
    // payloads, entropy stream
    for (cut <- Seq(3, 10, 30, 120, good.length - 5))
      intercept[IllegalArgumentException](JpegCodec.decode(good.take(cut)))
    // a baseline stream relabeled SOF2 is MALFORMED progressive (its
    // single scan covers Ss=0..Se=63, illegal for a progressive DC
    // scan) — since round 10 SOF2 itself is supported
    // (JpegProgressiveSpec), so the rejection is scan-header
    // validation, not frame-type rejection
    val prog = good.clone()
    val sofOff = findMarker(prog, 0xC0)
    prog(sofOff + 1) = 0xC2.toByte
    val e1 = intercept[IllegalArgumentException](JpegCodec.decode(prog))
    assert(e1.getMessage.contains("progressive"))
    // crafted 65535x65535 dims must be rejected BEFORE plane allocation
    val bomb = good.clone()
    val dimOff = sofOff + 5 // len(2) + precision(1) → height
    bomb(dimOff) = 0xFF.toByte; bomb(dimOff + 1) = 0xFF.toByte
    bomb(dimOff + 2) = 0xFF.toByte; bomb(dimOff + 3) = 0xFF.toByte
    val e2 = intercept[IllegalArgumentException](JpegCodec.decode(bomb))
    assert(e2.getMessage.contains("implausible"))
  }

  private def findMarker(bytes: Array[Byte], mk: Int): Int = {
    var i = 2
    while (i + 1 < bytes.length) {
      if ((bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == mk)
        return i
      i += 1
    }
    fail(f"marker FF$mk%02X not found")
  }
}
