package graft.operators

/** EXIF (TIFF-in-APP1) writer + INDEPENDENT parser — the metadata
  * sidecar real crawl JPEGs carry, and the one that makes image PII
  * scrubbing a REQUIRED curation step: GPS coordinates ride in a GPS
  * IFD inside APP1. The reference has no image handling at all; this
  * implements the public TIFF 6.0 / EXIF layout directly: byte-order
  * marker (II little / MM big — the fixture exercises BOTH), magic 42,
  * IFD entry walk (tag, type, count, inline-or-offset value), ASCII
  * and RATIONAL value types, and the GPS sub-IFD pointer (tag 0x8825).
  *
  * Parser is generic (walks whatever IFD layout it finds, bounds-safe,
  * None on anything malformed — untrusted crawl bytes); the writer's
  * fixed layout is just the fixture. [[scrub]] drops every Exif APP1
  * segment while leaving all other JPEG segments byte-identical — the
  * GPS-PII removal that must NOT disturb the image stream itself.
  */
object ExifCodec extends Serializable {

  final case class Gps(latRef: String, latDeg: Int, latMin: Int,
      latSecMilli: Long, lonRef: String, lonDeg: Int, lonMin: Int,
      lonSecMilli: Long)

  final case class Exif(byteOrder: String, make: String,
      gps: Option[Gps])

  // ------------------------------------------------------------ fixture

  def makeOf(id: Long): String = s"cam${id % 10}"
  def littleEndian(id: Long): Boolean = id % 2 == 0
  def hasGps(id: Long): Boolean = id % 3 == 0
  def latRef(id: Long): String = if (id % 2 == 0) "N" else "S"
  def lonRef(id: Long): String = if ((id / 2) % 2 == 0) "E" else "W"
  def latDeg(id: Long): Int = (id % 90).toInt
  def latMin(id: Long): Int = (id % 60).toInt
  def latSecMilli(id: Long): Long = (id * 7) % 60000
  def lonDeg(id: Long): Int = (id % 180).toInt
  def lonMin(id: Long): Int = ((id * 3) % 60).toInt
  def lonSecMilli(id: Long): Long = (id * 11) % 60000

  // ------------------------------------------------------------- writer

  private class W(le: Boolean) {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (le) { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      else { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def u32(v: Long): Unit =
      if (le) { out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
        out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt) }
      else { out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
        out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt) }
    def raw(b: Array[Byte]): Unit = out.write(b)
  }

  /** The APP1 payload ("Exif\0\0" + TIFF) for fixture id. */
  def exifPayload(id: Long): Array[Byte] = {
    val le = littleEndian(id)
    val w = new W(le)
    val make = makeOf(id).getBytes("US-ASCII") :+ 0.toByte // NUL-terminated
    val gps = hasGps(id)
    // fixed layout, all offsets from TIFF start:
    // hdr 8 | IFD0 (2 + n*12 + 4) | make | [GPS IFD 2+4*12+4 | lat 24 | lon 24]
    val n0 = if (gps) 2 else 1
    val ifd0End = 8 + 2 + n0 * 12 + 4
    val makeOff = ifd0End
    val gpsOff = makeOff + make.length
    val latOff = gpsOff + 2 + 4 * 12 + 4
    val lonOff = latOff + 24
    w.raw(if (le) "II".getBytes("US-ASCII") else "MM".getBytes("US-ASCII"))
    w.u16(42)
    w.u32(8)
    // IFD0
    w.u16(n0)
    w.u16(0x010F); w.u16(2); w.u32(make.length.toLong); w.u32(makeOff.toLong)
    if (gps) { w.u16(0x8825); w.u16(4); w.u32(1); w.u32(gpsOff.toLong) }
    w.u32(0) // next IFD
    w.raw(make)
    if (gps) {
      def refBytes(r: String): Unit = {
        // ASCII count 2 (char + NUL) — fits inline; inline values are
        // raw bytes padded to the 4-byte value slot
        w.raw(Array(r.charAt(0).toByte, 0, 0, 0))
      }
      w.u16(4)
      w.u16(1); w.u16(2); w.u32(2); refBytes(latRef(id))
      w.u16(2); w.u16(5); w.u32(3); w.u32(latOff.toLong)
      w.u16(3); w.u16(2); w.u32(2); refBytes(lonRef(id))
      w.u16(4); w.u16(5); w.u32(3); w.u32(lonOff.toLong)
      w.u32(0)
      // lat deg/min/sec rationals, sec in thousandths
      w.u32(latDeg(id).toLong); w.u32(1)
      w.u32(latMin(id).toLong); w.u32(1)
      w.u32(latSecMilli(id)); w.u32(1000)
      w.u32(lonDeg(id).toLong); w.u32(1)
      w.u32(lonMin(id).toLong); w.u32(1)
      w.u32(lonSecMilli(id)); w.u32(1000)
    }
    "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++
      w.out.toByteArray
  }

  /** Fixture JPEG with the EXIF APP1 spliced right after SOI. */
  def encodeWithExif(id: Long): Array[Byte] = {
    val jpg = JpegCodec.encode(id)
    val app1 = exifPayload(id)
    val seg = Array(0xFF.toByte, 0xE1.toByte,
      (((app1.length + 2) >> 8) & 0xFF).toByte,
      ((app1.length + 2) & 0xFF).toByte) ++ app1
    jpg.take(2) ++ seg ++ jpg.drop(2)
  }

  // ------------------------------------------------------------- parser

  /** Walk the JPEG segment stream to the first Exif APP1; None when
    * absent or malformed (never throws on garbage). */
  def parse(bytes: Array[Byte]): Option[Exif] = {
    findApp1(bytes).flatMap { case (off, len) =>
      parseTiff(bytes, off + 6, len - 6)
    }
  }

  /** (payload offset, payload length) of the first Exif APP1. */
  private def findApp1(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF ||
        (bytes(1) & 0xFF) != 0xD8) return None
    var off = 2
    while (off + 4 <= bytes.length) {
      if ((bytes(off) & 0xFF) != 0xFF) return None
      val marker = bytes(off + 1) & 0xFF
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / SOS
      val len = ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
      if (len < 2 || off + 2 + len > bytes.length) return None
      if (marker == 0xE1 && len >= 8 &&
          new String(bytes, off + 4, 4, "US-ASCII") == "Exif" &&
          bytes(off + 8) == 0 && bytes(off + 9) == 0)
        return Some((off + 4, len - 2))
      off += 2 + len
    }
    None
  }

  private def parseTiff(bytes: Array[Byte], tiff: Int, tlen: Int)
      : Option[Exif] = {
    if (tlen < 8) return None
    val order = new String(bytes, tiff, 2, "US-ASCII")
    val le = order match {
      case "II" => true
      case "MM" => false
      case _ => return None
    }
    def u16(at: Int): Int = {
      if (at < 0 || at + 2 > tlen) return -1
      val a = bytes(tiff + at) & 0xFF
      val b = bytes(tiff + at + 1) & 0xFF
      if (le) a | (b << 8) else (a << 8) | b
    }
    def u32(at: Int): Long = {
      if (at < 0 || at + 4 > tlen) return -1L
      val v = (0 until 4).map(i => (bytes(tiff + at + i) & 0xFFL))
      if (le) v(0) | (v(1) << 8) | (v(2) << 16) | (v(3) << 24)
      else (v(0) << 24) | (v(1) << 16) | (v(2) << 8) | v(3)
    }
    if (u16(2) != 42) return None
    val ifd0 = u32(4)
    if (ifd0 < 0 || ifd0 > Int.MaxValue) return None

    /** (tag -> (type, count, value-slot offset)) of one IFD. */
    def entries(at: Int): Option[Map[Int, (Int, Long, Int)]] = {
      val n = u16(at)
      if (n < 0 || n > 512) return None
      if (at + 2 + n * 12 + 4 > tlen) return None
      Some((0 until n).map { i =>
        val e = at + 2 + i * 12
        u16(e) -> ((u16(e + 2), u32(e + 4), e + 8))
      }.toMap)
    }
    def ascii(typ: Int, count: Long, slot: Int): Option[String] = {
      if (typ != 2 || count < 1 || count > 4096) return None
      val at = if (count <= 4) slot else u32(slot).toInt
      if (at < 0 || at + count > tlen) return None
      // drop the terminating NUL
      Some(new String(bytes, tiff + at, count.toInt - 1, "US-ASCII"))
    }
    def rationals(typ: Int, count: Long, slot: Int, n: Int)
        : Option[Seq[(Long, Long)]] = {
      if (typ != 5 || count != n) return None
      val at = u32(slot).toInt
      if (at < 0 || at + n * 8 > tlen) return None
      Some((0 until n).map(i => (u32(at + i * 8), u32(at + i * 8 + 4))))
    }

    entries(ifd0.toInt).flatMap { e0 =>
      val make = e0.get(0x010F)
        .flatMap { case (t, c, s) => ascii(t, c, s) }
        .getOrElse("")
      val gps = e0.get(0x8825).flatMap { case (t, c, s) =>
        if (t != 4 || c != 1) None
        else entries(u32(s).toInt).flatMap { g =>
          for {
            (lt, lc, ls) <- g.get(1); laRef <- ascii(lt, lc, ls)
            (at, ac, as_) <- g.get(2); lat <- rationals(at, ac, as_, 3)
            (ot, oc, os) <- g.get(3); loRef <- ascii(ot, oc, os)
            (bt, bc, bs) <- g.get(4); lon <- rationals(bt, bc, bs, 3)
            if lat.forall(_._2 > 0) && lon.forall(_._2 > 0)
          } yield Gps(laRef,
            (lat(0)._1 / lat(0)._2).toInt, (lat(1)._1 / lat(1)._2).toInt,
            lat(2)._1 * 1000 / lat(2)._2,
            loRef,
            (lon(0)._1 / lon(0)._2).toInt, (lon(1)._1 / lon(1)._2).toInt,
            lon(2)._1 * 1000 / lon(2)._2)
        }
      }
      Some(Exif(order, make, gps))
    }
  }

  /** Drop every Exif APP1 segment; all other segments (and the entropy
    * stream) stay byte-identical. Non-JPEG input returns unchanged. */
  def scrub(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF ||
        (bytes(1) & 0xFF) != 0xD8) return bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, 2)
    var off = 2
    var copied = false
    while (!copied && off + 4 <= bytes.length) {
      val marker = bytes(off + 1) & 0xFF
      if ((bytes(off) & 0xFF) != 0xFF || marker == 0xDA ||
          marker == 0xD9) {
        // entropy stream (or malformed): copy the remainder verbatim
        out.write(bytes, off, bytes.length - off)
        copied = true
      } else {
        val len = ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
        if (len < 2 || off + 2 + len > bytes.length) {
          out.write(bytes, off, bytes.length - off)
          copied = true
        } else {
          val isExif = marker == 0xE1 && len >= 8 &&
            new String(bytes, off + 4, 4, "US-ASCII") == "Exif" &&
            bytes(off + 8) == 0 && bytes(off + 9) == 0
          if (!isExif) out.write(bytes, off, 2 + len)
          off += 2 + len
        }
      }
    }
    out.toByteArray
  }
}
