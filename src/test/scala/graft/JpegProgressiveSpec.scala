package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JpegCodec

/** Progressive (SOF2) JPEG decode — T.81 Annex G: spectral selection,
  * successive approximation (DC + AC first and refinement passes), EOB
  * runs, and restart framing inside progressive scans. The fixture
  * encoder writes the SAME coefficient content as the baseline stream
  * across a 7-scan script, so every decoded pixel is pinned bit-exactly
  * by the coefficient-space formula; ImageIO's libjpeg-backed codec
  * cross-checks both directions with its own (optimized-table,
  * IJG-scan-script) streams. */
class JpegProgressiveSpec extends AnyFunSuite {

  test("progressive roundtrip reproduces the coefficient-space formula " +
      "bit-exactly on every dims combination") {
    for (id <- 0L until 154L) {
      val (w, h) = JpegCodec.dims(id)
      val bytes = JpegCodec.encodeProgressive(id)
      // the stream must really be progressive, not a baseline copy
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2), s"id=$id SOF2")
      val img = JpegCodec.decode(bytes)
      assert(img.w == w && img.h == h, s"id=$id dims")
      for { y <- 0 until h; x <- 0 until w } {
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) ==
          JpegCodec.expectedRgb(id, x, y), s"id=$id ($x,$y)")
      }
      // and must decode identically to the baseline stream
      val base = JpegCodec.decode(JpegCodec.encode(id))
      assert(java.util.Arrays.equals(base.px, img.px),
        s"id=$id progressive vs baseline decode")
    }
  }

  test("progressive restart markers reset predictors and EOB runs " +
      "in every scan") {
    for (id <- Seq(0L, 7L, 42L, 153L); ri <- 1 to 3) {
      val bytes = JpegCodec.encodeProgressive(id, restartInterval = ri)
      val nRst = bytes.sliding(2).count(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) >= 0xD0 &&
          (p(1) & 0xFF) <= 0xD7)
      assert(nRst > 0, s"id=$id ri=$ri emitted no RSTn")
      val img = JpegCodec.decode(bytes)
      val (w, h) = JpegCodec.dims(id)
      for { y <- 0 until h; x <- 0 until w } {
        assert((img.r(x, y), img.g(x, y), img.b(x, y)) ==
          JpegCodec.expectedRgb(id, x, y), s"id=$id ri=$ri ($x,$y)")
      }
    }
  }

  test("progressive cross-checks against the JDK's independent " +
      "ImageIO codec in both directions") {
    // direction 1: libjpeg must accept our SOF2 stream and reconstruct
    // the same pixels it reads from the equivalent baseline stream
    for (id <- Seq(0L, 42L, 153L)) {
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(JpegCodec.encodeProgressive(id)))
      assert(javaImg != null, s"ImageIO rejected our progressive id=$id")
      val javaBase = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(JpegCodec.encode(id)))
      val (w, h) = JpegCodec.dims(id)
      assert(javaImg.getWidth == w && javaImg.getHeight == h)
      for { y <- 0 until h; x <- 0 until w }
        assert(javaImg.getRGB(x, y) == javaBase.getRGB(x, y),
          s"ImageIO progressive vs baseline id=$id ($x,$y)")
    }
    // direction 2: a progressive JPEG produced by ImageIO's own encoder
    // (IJG scan script: DC Al=1, AC bands at Al=2 with two refinement
    // passes, optimized Huffman tables with real EOBn symbols) must
    // decode under our parser to what ImageIO itself reads back —
    // this is the path that exercises multi-block EOB runs and AC
    // successive approximation against an independent implementation
    val (gw, gh) = (40, 28)
    val buf = new java.awt.image.BufferedImage(
      gw, gh, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for { y <- 0 until gh; x <- 0 until gw } {
      val r = 40 + 3 * x + y
      val g = 200 - 2 * x - y
      val b = 70 + x + 2 * y
      buf.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wtr.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream
    wtr.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    wtr.write(null, new javax.imageio.IIOImage(buf, null, null), p)
    wtr.dispose()
    val foreign = bos.toByteArray
    assert(foreign.sliding(2).exists(a =>
      (a(0) & 0xFF) == 0xFF && (a(1) & 0xFF) == 0xC2),
      "ImageIO did not emit SOF2 — progressive mode not engaged")
    val ours = JpegCodec.decode(foreign)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(foreign))
    assert(ours.w == ref.getWidth && ours.h == ref.getHeight)
    var sumDiff = 0L
    var maxDiff = 0
    for { y <- 0 until ours.h; x <- 0 until ours.w } {
      val rgb = ref.getRGB(x, y)
      val ds = Seq(
        math.abs(ours.r(x, y) - (rgb >> 16 & 0xFF)),
        math.abs(ours.g(x, y) - (rgb >> 8 & 0xFF)),
        math.abs(ours.b(x, y) - (rgb & 0xFF)))
      sumDiff += ds.sum
      maxDiff = math.max(maxDiff, ds.max)
    }
    val meanDiff = sumDiff.toDouble / (ours.w * ours.h * 3)
    assert(maxDiff <= 8, s"max channel diff $maxDiff vs ImageIO")
    assert(meanDiff <= 2.0, s"mean channel diff $meanDiff vs ImageIO")
  }

  test("general-pixel progressive encoder: bit-identical decode to the " +
      "sequential encoder, and ImageIO interop") {
    import graft.operators.Multimodal.BmpCodec
    val (w, h) = (45, 30) // partial MCUs both axes
    val px = new Array[Byte](w * h * 3)
    for { y <- 0 until h; x <- 0 until w } {
      px((y * w + x) * 3) = (40 + 3 * x + y).toByte
      px((y * w + x) * 3 + 1) = (200 - 2 * x - y).toByte
      px((y * w + x) * 3 + 2) = (70 + x + 2 * y).toByte
    }
    val src = BmpCodec.Image(w, h, px)
    for (quality <- Seq(70, 85, 95)) {
      val prog = JpegCodec.encodePixelsProgressive(src, quality)
      assert(prog.sliding(2).exists(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2),
        s"q=$quality not progressive")
      // the progressive scans carry the SAME quantized coefficients as
      // the sequential encoder's — our decoder must reconstruct the
      // byte-identical image from both wire formats
      val seqImg = JpegCodec.decode(JpegCodec.encodePixels(src, quality))
      val progImg = JpegCodec.decode(prog)
      assert(progImg.w == w && progImg.h == h)
      assert(java.util.Arrays.equals(progImg.px, seqImg.px),
        s"q=$quality progressive vs sequential decode diverged")
      // libjpeg must accept the stream and agree within decoder freedom
      val javaImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(prog))
      assert(javaImg != null, s"ImageIO rejected q=$quality progressive")
      var maxD = 0
      for { y <- 0 until h; x <- 0 until w } {
        val rgb = javaImg.getRGB(x, y)
        maxD = math.max(maxD, Seq(
          math.abs(progImg.r(x, y) - (rgb >> 16 & 0xFF)),
          math.abs(progImg.g(x, y) - (rgb >> 8 & 0xFF)),
          math.abs(progImg.b(x, y) - (rgb & 0xFF))).max)
      }
      assert(maxD <= 8, s"q=$quality ImageIO disagreement $maxD")
    }
  }

  test("malformed progressive scan headers are rejected cleanly") {
    val good = JpegCodec.encodeProgressive(5L)
    // locate the first SOS (FF DA) and corrupt its parameters
    def firstSos(b: Array[Byte]): Int = {
      var i = 2
      while (!((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xDA)) i += 1
      i
    }
    // first scan is the interleaved DC scan (FF DA len len ns=3,
    // 3 comp pairs): Ss at sos+11, Se at sos+12, AhAl at sos+13
    val sos = firstSos(good)
    // Ss > Se in an AC scan header shape (Ss=5, Se=2)
    val badBand = good.clone()
    badBand(sos + 11) = 5
    badBand(sos + 12) = 2
    intercept[IllegalArgumentException](JpegCodec.decode(badBand))
    // successive-approximation jump (Ah=3, Al=0 — not Al+1)
    val badAh = good.clone()
    badAh(sos + 13) = 0x30
    intercept[IllegalArgumentException](JpegCodec.decode(badAh))
    // interleaved AC scan (ns=3 with Ss>0) must be rejected
    val badNs = good.clone()
    badNs(sos + 11) = 1
    badNs(sos + 12) = 63
    intercept[IllegalArgumentException](JpegCodec.decode(badNs))
    // truncation mid-scan
    intercept[IllegalArgumentException](
      JpegCodec.decode(good.take(good.length / 2)))
  }

  test("fuzz: mutated progressive streams never escape the " +
      "IllegalArgumentException contract") {
    val rnd = new scala.util.Random(20260814)
    val seed = JpegCodec.encodeProgressive(5L)
    for (_ <- 0 until 500) {
      val b = seed.clone()
      for (_ <- 0 to rnd.nextInt(8))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try JpegCodec.decode(b)
      catch { case _: IllegalArgumentException => () }
    }
  }
}
