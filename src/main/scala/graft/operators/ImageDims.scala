package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** Header-only image dimension extraction — the corpus-stats path that
  * must NOT pay a pixel decode. At 100 TB a "what resolutions does this
  * image lake hold" census over full decodes is compute-bound on IDCT
  * and inflate for an answer that lives in the first kilobyte; every
  * serious pipeline (and `file`/`identify` themselves) reads headers.
  * Formats: BMP, PNG, GIF, JPEG (marker walk to any SOF), TIFF (IFD
  * walk, both byte orders), PPM, and WebP in all three wire layouts
  * (lossy VP8 keyframe header, lossless VP8L bit-packed dims, VP8X
  * extended canvas) — WebP is ubiquitous in modern crawls and has no
  * full decoder here (VP8 entropy decode is out of scope), which is
  * exactly why the header path matters.
  *
  * MultimodalCodecSpec-style honesty: for every format with a full
  * decoder in this repo, ImageDimsSpec asserts the header path and the
  * pixel decoder agree on dims for the whole fixture space; WebP is
  * pinned by hand-assembled golden headers from the public container
  * spec (RFC 9649) + VP8 (RFC 6386 §9.1) / VP8L bit layouts.
  */
object ImageDims {

  final case class Dims(format: String, w: Int, h: Int)

  @inline private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  @inline private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  @inline private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  @inline private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  /** Null (never throws) when the prefix is not a recognizable header
    * of any supported format. Reads only header bytes — never inflate,
    * never entropy decode. */
  def sniff(b: Array[Byte]): Dims = {
    try {
      if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
        val w = u32le(b, 18).toInt
        val h = u32le(b, 22).toInt                 // negative = top-down
        if (w <= 0 || h == 0) null else Dims("bmp", w, math.abs(h))
      } else if (b.length >= 24 && b(0) == 0x89.toByte && b(1) == 'P' &&
          b(2) == 'N' && b(3) == 'G') {
        if (new String(b, 12, 4, US_ASCII) != "IHDR") null
        else {
          val w = u32be(b, 16)
          val h = u32be(b, 20)
          if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
          else Dims("png", w.toInt, h.toInt)
        }
      } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' &&
          b(2) == 'F' && b(3) == '8' && (b(4) == '7' || b(4) == '9') &&
          b(5) == 'a') {
        Dims("gif", u16le(b, 6), u16le(b, 8))
      } else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF &&
          (b(1) & 0xFF) == 0xD8) {
        jpegSof(b)
      } else if (b.length >= 8 &&
          ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
           (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))) {
        tiffIfd(b, le = b(0) == 'I')
      } else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
        ppmHeader(b)
      } else if (b.length >= 16 && b(0) == 'R' && b(1) == 'I' &&
          b(2) == 'F' && b(3) == 'F' &&
          new String(b, 8, 4, US_ASCII) == "WEBP") {
        webp(b)
      } else if (b.length >= 16 &&
          new String(b, 4, 4, US_ASCII) == "ftyp" &&
          (new String(b, 8, 4, US_ASCII) == "avif" ||
           new String(b, 8, 4, US_ASCII) == "heic" ||
           new String(b, 8, 4, US_ASCII) == "mif1")) {
        avif(b)
      } else null
    } catch { case _: ArrayIndexOutOfBoundsException => null }
  }

  /** Marker walk to the first start-of-frame (RFC 2435 / T.81 layout:
    * every non-RST/standalone marker carries a BE16 length). SOF is
    * any of C0-CF except C4 (DHT), C8 (JPG extension), CC (DAC). */
  private def jpegSof(b: Array[Byte]): Dims = {
    var p = 2
    while (p + 4 <= b.length) {
      if ((b(p) & 0xFF) != 0xFF) return null
      var m = b(p + 1) & 0xFF
      while (m == 0xFF && p + 2 < b.length) { p += 1; m = b(p + 1) & 0xFF }
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) { p += 2 }
      else {
        val len = u16be(b, p + 2)
        if (len < 2 || p + 2 + len > b.length) return null
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          if (len < 7) return null
          return Dims("jpg", u16be(b, p + 7), u16be(b, p + 5))
        }
        if (m == 0xD9 || m == 0xDA) return null  // hit scan data: no SOF
        p += 2 + len
      }
    }
    null
  }

  private def tiffIfd(b: Array[Byte], le: Boolean): Dims = {
    def r16(i: Int) = if (le) u16le(b, i) else u16be(b, i)
    def r32(i: Int) = if (le) u32le(b, i) else u32be(b, i)
    val ifd = r32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val n = r16(ifd.toInt)
    var w = -1L
    var h = -1L
    var e = 0
    while (e < n) {
      val off = ifd.toInt + 2 + 12 * e
      if (off + 12 > b.length) return null
      val tag = r16(off)
      val typ = r16(off + 2)
      if (tag == 256 || tag == 257) {
        val v = typ match {
          case 3 => r16(off + 8).toLong            // SHORT, left-justified
          case 4 => r32(off + 8)                   // LONG
          case _ => return null
        }
        if (tag == 256) w = v else h = v
      }
      e += 1
    }
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
    else Dims("tiff", w.toInt, h.toInt)
  }

  private def ppmHeader(b: Array[Byte]): Dims = {
    // P6, then whitespace-separated w h maxval with '#' comments
    var p = 2
    def nextInt(): Int = {
      var v = -1
      var done = false
      while (!done) {
        if (p >= b.length) return -1
        val c = b(p) & 0xFF
        if (c == '#') { while (p < b.length && b(p) != '\n') p += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') {
          if (v >= 0) done = true else p += 1
        } else if (c >= '0' && c <= '9') {
          v = (if (v < 0) 0 else v) * 10 + (c - '0')
          if (v > (1 << 20)) return -1
          p += 1
        } else return -1
      }
      v
    }
    val w = nextInt()
    val h = nextInt()
    if (w <= 0 || h <= 0) null else Dims("ppm", w, h)
  }

  /** RFC 9649 container: first chunk decides the layout. */
  private def webp(b: Array[Byte]): Dims = {
    val tag = new String(b, 12, 4, US_ASCII)
    val sz = u32le(b, 16)
    tag match {
      case "VP8 " =>                               // RFC 6386 §9.1 keyframe
        val p = 20
        if (sz < 10 || p + 10 > b.length) return null
        if ((b(p) & 0x01) != 0) return null        // must be a keyframe
        if ((b(p + 3) & 0xFF) != 0x9D || (b(p + 4) & 0xFF) != 0x01 ||
          (b(p + 5) & 0xFF) != 0x2A) return null   // start code
        Dims("webp", u16le(b, p + 6) & 0x3FFF, u16le(b, p + 8) & 0x3FFF)
      case "VP8L" =>                               // lossless bitstream
        val p = 20
        if (sz < 5 || p + 5 > b.length) return null
        if ((b(p) & 0xFF) != 0x2F) return null     // signature
        val bits = u32le(b, p + 1)
        val w = ((bits & 0x3FFF) + 1).toInt        // 14-bit w-1, LSB first
        val h = (((bits >> 14) & 0x3FFF) + 1).toInt
        if (((bits >> 29) & 0x7) != 0) return null // version must be 0
        Dims("webp", w, h)
      case "VP8X" =>                               // extended: 24-bit canvas
        val p = 20
        if (sz < 10 || p + 10 > b.length) return null
        val w = ((b(p + 4) & 0xFF) | ((b(p + 5) & 0xFF) << 8) |
          ((b(p + 6) & 0xFF) << 16)) + 1
        val h = ((b(p + 7) & 0xFF) | ((b(p + 8) & 0xFF) << 8) |
          ((b(p + 9) & 0xFF) << 16)) + 1
        Dims("webp", w, h)
      case _ => null
    }
  }

  /** AVIF/HEIC (ISO BMFF / HEIF): the PRIMARY item's `ispe` property,
    * resolved properly through `pitm` (primary item id) and `ipma`
    * (item → 1-based ipco property indexes) — NOT the first `ispe`
    * in file order, which is often a thumbnail's. Box walk only;
    * the AV1/HEVC payload is never touched. */
  private def avif(b: Array[Byte]): Dims = {
    // one level of box children in [from, to)
    def children(from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var p = from
      while (p + 8 <= to) {
        var size = u32be(b, p)
        var hdr = 8
        if (size == 1) {                       // 64-bit largesize
          if (p + 16 > to) return out.result()
          val big = (u32be(b, p + 8) << 32) | u32be(b, p + 12)
          size = big
          hdr = 16
        } else if (size == 0) size = (to - p).toLong // to end of container
        if (size < hdr || p + size > to) return out.result()
        out += ((new String(b, p + 4, 4, US_ASCII), p + hdr,
          p + size.toInt))
        p += size.toInt
      }
      out.result()
    }
    val meta = children(0, b.length).collectFirst {
      case ("meta", f, t) => (f + 4, t)        // fullbox: skip ver/flags
    }.getOrElse(return null)
    val kids = children(meta._1, meta._2)
    val primaryId = kids.collectFirst { case ("pitm", f, t) =>
      val ver = b(f) & 0xFF
      if (ver == 0) u16be(b, f + 4) else u32be(b, f + 4).toInt
    }.getOrElse(return null)
    val iprp = kids.collectFirst { case ("iprp", f, t) => (f, t) }
      .getOrElse(return null)
    val iprpKids = children(iprp._1, iprp._2)
    val ipco = iprpKids.collectFirst { case ("ipco", f, t) =>
      children(f, t)
    }.getOrElse(return null)
    // ipma: find the primary item's property indexes (1-based in ipco)
    val indexes = iprpKids.collectFirst { case ("ipma", f, t) =>
      val ver = b(f) & 0xFF
      val flags = u32be(b, f) & 0xFFFFFF
      var p = f + 4
      val n = u32be(b, p); p += 4
      var found: Seq[Int] = null
      var i = 0L
      while (i < n && found == null && p < t) {
        val itemId = if (ver < 1) { val v = u16be(b, p); p += 2; v }
          else { val v = u32be(b, p).toInt; p += 4; v }
        val cnt = b(p) & 0xFF; p += 1
        val idx = Seq.newBuilder[Int]
        var a = 0
        while (a < cnt) {
          if ((flags & 1) != 0) { idx += (u16be(b, p) & 0x7FFF); p += 2 }
          else { idx += (b(p) & 0x7F); p += 1 }
          a += 1
        }
        if (itemId == primaryId) found = idx.result()
        i += 1
      }
      Option(found)
    }.flatten.getOrElse(return null)
    indexes.iterator
      .filter(i => i >= 1 && i <= ipco.length)
      .map(i => ipco(i - 1))
      .collectFirst { case ("ispe", f, t) if t - f >= 12 =>
        val w = u32be(b, f + 4)
        val h = u32be(b, f + 8)
        if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
        else Dims("avif", w.toInt, h.toInt)
      }.orNull
  }

  // ----- WebP fixture headers (synth) ------------------------------------
  // The dims census is BY DESIGN a header parse, so the fixtures carry
  // real container + frame-header bytes with junk entropy payload —
  // there is no VP8 decoder here to lie to, and the spec documents the
  // scope. Formulas are SQL-expressible for the oracle.

  def webpW(id: Long): Int = 100 + (id % 50).toInt
  def webpH(id: Long): Int = 80 + (id % 40).toInt
  def webpXW(id: Long): Int = 640 + (id % 100).toInt
  def webpXH(id: Long): Int = 480 + (id % 50).toInt

  private def riff(chunkTag: String, payload: Array[Byte]): Array[Byte] = {
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes(US_ASCII))
    val total = 4 + 8 + padded.length
    var i = 0
    while (i < 4) { out.write((total >> (8 * i)) & 0xFF); i += 1 }
    out.write("WEBP".getBytes(US_ASCII))
    out.write(chunkTag.getBytes(US_ASCII))
    i = 0
    while (i < 4) { out.write((payload.length >> (8 * i)) & 0xFF); i += 1 }
    out.write(padded)
    out.toByteArray
  }

  /** Lossless layout: VP8L signature + bit-packed dims + junk body. */
  def encodeWebpVp8l(id: Long): Array[Byte] = {
    val bits = (webpW(id) - 1).toLong | ((webpH(id) - 1).toLong << 14)
    val body = new Array[Byte](5 + 24 + (id % 17).toInt)
    body(0) = 0x2F
    var i = 0
    while (i < 4) { body(1 + i) = ((bits >> (8 * i)) & 0xFF).toByte; i += 1 }
    i = 5
    while (i < body.length) { body(i) = ((id * 3 + i) % 250).toByte; i += 1 }
    riff("VP8L", body)
  }

  /** Lossy layout: VP8 keyframe tag + start code + scaled dims. */
  def encodeWebpVp8(id: Long): Array[Byte] = {
    val body = new Array[Byte](10 + 32 + (id % 13).toInt)
    val part0 = body.length - 10
    // frame tag: keyframe(0) | version(0) | show(1) | part0 size
    val tag = (1 << 4) | (part0 << 5)
    body(0) = (tag & 0xFF).toByte
    body(1) = ((tag >> 8) & 0xFF).toByte
    body(2) = ((tag >> 16) & 0xFF).toByte
    body(3) = 0x9D.toByte; body(4) = 0x01; body(5) = 0x2A
    body(6) = (webpW(id) & 0xFF).toByte
    body(7) = ((webpW(id) >> 8) & 0x3F).toByte
    body(8) = (webpH(id) & 0xFF).toByte
    body(9) = ((webpH(id) >> 8) & 0x3F).toByte
    var i = 10
    while (i < body.length) { body(i) = ((id * 7 + i) % 250).toByte; i += 1 }
    riff("VP8 ", body)
  }

  /** Extended layout: VP8X canvas chunk followed by a lossless frame
    * chunk (the canvas governs per RFC 9649 — sniff must stop there). */
  def encodeWebpVp8x(id: Long): Array[Byte] = {
    val x = new Array[Byte](10)
    val w = webpXW(id) - 1
    val h = webpXH(id) - 1
    x(4) = (w & 0xFF).toByte; x(5) = ((w >> 8) & 0xFF).toByte
    x(6) = ((w >> 16) & 0xFF).toByte
    x(7) = (h & 0xFF).toByte; x(8) = ((h >> 8) & 0xFF).toByte
    x(9) = ((h >> 16) & 0xFF).toByte
    val frameBits = (webpW(id) - 1).toLong | ((webpH(id) - 1).toLong << 14)
    val frame = new Array[Byte](5 + 16)
    frame(0) = 0x2F
    var i = 0
    while (i < 4) { frame(1 + i) = ((frameBits >> (8 * i)) & 0xFF).toByte; i += 1 }
    riffMulti(Seq(("VP8X", x), ("VP8L", frame)))
  }

  def avifW(id: Long): Int = 800 + (id % 200).toInt
  def avifH(id: Long): Int = 600 + (id % 150).toInt

  private def box(tag: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    val size = out.length
    out(0) = (size >> 24).toByte; out(1) = (size >> 16).toByte
    out(2) = (size >> 8).toByte; out(3) = size.toByte
    System.arraycopy(tag.getBytes(US_ASCII), 0, out, 4, 4)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }
  private def be32(v: Int): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** Minimal HEIF header structure for an AVIF: the thumbnail's ispe
    * comes FIRST in ipco, so a reader that grabs the first ispe (the
    * common shortcut) reports the thumbnail's dims — the sniffer must
    * resolve pitm → ipma → property index 2 instead. Payload bytes are
    * junk (dims live in the header; AV1 is never decoded here). */
  def encodeAvif(id: Long): Array[Byte] = {
    val ispeThumb = box("ispe",
      be32(0) ++ be32(avifW(id) / 4) ++ be32(avifH(id) / 4))
    val ispePrimary = box("ispe",
      be32(0) ++ be32(avifW(id)) ++ be32(avifH(id)))
    val ipco = box("ipco", ispeThumb ++ ispePrimary)
    // ipma v0 flags0: 2 entries — item 2 (thumb) -> [1]; item 1 -> [2]
    val ipma = box("ipma", be32(0) ++ be32(2) ++
      Array[Byte](0, 2, 1, 0x01.toByte, 0, 1, 1, 0x02.toByte))
    val iprp = box("iprp", ipco ++ ipma)
    val pitm = box("pitm", be32(0) ++ Array[Byte](0, 1))
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++
      "pict".getBytes(US_ASCII) ++ new Array[Byte](13))
    val meta = box("meta", be32(0) ++ hdlr ++ pitm ++ iprp)
    val ftyp = box("ftyp", "avif".getBytes(US_ASCII) ++ be32(0) ++
      "avifmif1".getBytes(US_ASCII))
    val mdat = box("mdat",
      Array.tabulate[Byte](40 + (id % 23).toInt)(k => ((id + k * 3) % 251).toByte))
    ftyp ++ meta ++ mdat
  }

  private def riffMulti(chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    for ((t, payload) <- chunks) {
      body.write(t.getBytes(US_ASCII))
      val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
      var i = 0
      while (i < 4) { body.write((payload.length >> (8 * i)) & 0xFF); i += 1 }
      body.write(padded)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes(US_ASCII))
    val total = 4 + body.size()
    var i = 0
    while (i < 4) { out.write((total >> (8 * i)) & 0xFF); i += 1 }
    out.write("WEBP".getBytes(US_ASCII))
    out.write(body.toByteArray)
    out.toByteArray
  }
}
