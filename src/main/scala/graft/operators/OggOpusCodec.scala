package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** Clean-room Ogg/Opus container walk (RFC 3533 Ogg page framing +
  * RFC 7845 Opus-in-Ogg encapsulation). Opus is the dominant delivery
  * codec for crawled speech/voice audio (WebRTC recordings, podcast
  * re-encodes, YouTube audio tracks); the curation census — duration,
  * channels, pre-skip, packet/page integrity — needs the CONTAINER
  * walked correctly, not the SILK/CELT transform decoded (nothing
  * downstream consumes PCM here; the honest-scope argument of
  * [[Mp3Codec]]). The walk verifies per-page CRCs with Ogg's own
  * CRC-32 (0x04C11DB7, unreflected, zero init — NOT zlib's), stitches
  * continued packets across page boundaries by the lacing rules, and
  * parses the OpusHead/OpusTags header packets.
  *
  * Wire facts (all public):
  *   - page = "OggS" ver(0) type granule(8 LE) serial(4 LE) seq(4 LE)
  *     crc(4 LE) nSegs lacing[nSegs] payload; type bits: 1=continued
  *     packet, 2=bos, 4=eos
  *   - lacing: segments of 255 continue the packet, < 255 terminates it
  *     (a packet of length 255k needs a final 0 lacing value)
  *   - CRC computed over the whole page with the CRC field zeroed
  *   - OpusHead: magic + version(1) + channels + preSkip(2 LE) +
  *     inputRate(4 LE) + gain(2) + mappingFamily; granule positions
  *     count 48 kHz samples, duration = lastGranule − preSkip
  *     (RFC 7845 §4/§5.1)
  */
object OggOpusCodec {

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  def oggCrc(b: Array[Byte], from: Int, len: Int, init: Int = 0): Int = {
    var crc = init
    var i = from
    val end = from + len
    while (i < end) {
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ (b(i) & 0xFF)) & 0xFF)
      i += 1
    }
    crc
  }

  /** Page CRC with the 4 CRC bytes at `from`+22 treated as zero — so
    * verification never mutates the caller's buffer (rows can share
    * backing arrays in Spark). */
  private def pageCrc(b: Array[Byte], from: Int, pageLen: Int): Int = {
    var crc = oggCrc(b, from, 22)
    var i = 0
    while (i < 4) { crc = (crc << 8) ^ CrcTable((crc >>> 24) & 0xFF); i += 1 }
    oggCrc(b, from + 26, pageLen - 26, crc)
  }

  final case class OpusInfo(
      serial: Long,
      channels: Int,
      preSkip: Int,
      inputRate: Long,
      nPages: Int,
      nPackets: Int,          // audio packets (head/tags excluded)
      durationMs: Long,       // (lastGranule - preSkip) * 1000 / 48000
      vendor: String,
      sawEos: Boolean)

  private final val MaxPacket = 4 << 20   // bomb cap per assembled packet

  /** Strict walk: null (never throws) on bad magic/version, any CRC
    * mismatch, serial change mid-stream, non-monotonic page sequence,
    * continued-flag inconsistency, truncated lacing/payload, a
    * non-Opus first packet, or a stream without bos/eos bracketing. */
  def walk(b: Array[Byte]): OpusInfo = {
    var p = 0
    val end = b.length
    var serial = -1L
    var expectSeq = 0L
    var nPages = 0
    var packets = 0
    var lastGranule = -1L
    var sawBos = false
    var sawEos = false
    var channels = -1
    var preSkip = -1
    var inputRate = -1L
    var vendor: String = null
    var headerPacketsSeen = 0
    var cur = new java.io.ByteArrayOutputStream()
    var midPacket = false
    while (p < end) {
      if (p + 27 > end) return null
      if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' || b(p + 3) != 'S')
        return null
      if (b(p + 4) != 0) return null                    // stream version
      val htype = b(p + 5) & 0xFF
      var granule = 0L
      var i = 0
      while (i < 8) { granule |= (b(p + 6 + i) & 0xFFL) << (8 * i); i += 1 }
      var ser = 0L
      i = 0
      while (i < 4) { ser |= (b(p + 14 + i) & 0xFFL) << (8 * i); i += 1 }
      var seq = 0L
      i = 0
      while (i < 4) { seq |= (b(p + 18 + i) & 0xFFL) << (8 * i); i += 1 }
      var crc = 0
      i = 0
      while (i < 4) { crc |= (b(p + 22 + i) & 0xFF) << (8 * i); i += 1 }
      val nSegs = b(p + 26) & 0xFF
      if (p + 27 + nSegs > end) return null
      var payload = 0
      i = 0
      while (i < nSegs) { payload += b(p + 27 + i) & 0xFF; i += 1 }
      val pageLen = 27 + nSegs + payload
      if (p + pageLen > end) return null
      if (pageCrc(b, p, pageLen) != crc) return null
      if (nPages == 0) {
        if ((htype & 2) == 0) return null               // first page must be bos
        serial = ser
        sawBos = true
      } else {
        if (ser != serial) return null                  // single logical stream
        if ((htype & 2) != 0) return null
        if (seq != expectSeq) return null
      }
      if (nPages == 0 && seq != 0) return null
      expectSeq = seq + 1
      if ((htype & 1) != 0 && !midPacket) return null   // continued w/o remainder
      if ((htype & 1) == 0 && midPacket) return null    // dropped continuation
      if ((htype & 4) != 0) sawEos = true
      else if (sawEos) return null                      // pages after eos
      // assemble packets from the lacing table
      var off = p + 27 + nSegs
      i = 0
      while (i < nSegs) {
        val l = b(p + 27 + i) & 0xFF
        if (cur.size() + l > MaxPacket) return null
        cur.write(b, off, l)
        off += l
        if (l < 255) {
          val pkt = cur.toByteArray
          cur = new java.io.ByteArrayOutputStream()
          midPacket = false
          if (headerPacketsSeen == 0) {
            if (pkt.length < 19 ||
              new String(pkt, 0, 8, US_ASCII) != "OpusHead") return null
            if (pkt(8) != 1) return null                // OpusHead version
            channels = pkt(9) & 0xFF
            preSkip = (pkt(10) & 0xFF) | ((pkt(11) & 0xFF) << 8)
            inputRate = (pkt(12) & 0xFFL) | ((pkt(13) & 0xFFL) << 8) |
              ((pkt(14) & 0xFFL) << 16) | ((pkt(15) & 0xFFL) << 24)
            if ((pkt(18) & 0xFF) != 0) return null      // mapping family 0 only
            headerPacketsSeen = 1
          } else if (headerPacketsSeen == 1) {
            if (pkt.length < 12 ||
              new String(pkt, 0, 8, US_ASCII) != "OpusTags") return null
            val vl = (pkt(8) & 0xFF) | ((pkt(9) & 0xFF) << 8) |
              ((pkt(10) & 0xFF) << 16) | ((pkt(11) & 0xFF) << 24)
            if (vl < 0 || 12 + vl > pkt.length) return null
            vendor = new String(pkt, 12, vl, US_ASCII)
            headerPacketsSeen = 2
          } else packets += 1
        } else midPacket = true
        i += 1
      }
      if (granule != -1L) lastGranule = granule
      nPages += 1
      p += pageLen
    }
    if (!sawBos || !sawEos || midPacket) return null
    if (headerPacketsSeen < 2 || lastGranule < preSkip) return null
    OpusInfo(serial, channels, preSkip, inputRate, nPages, packets,
      (lastGranule - preSkip) * 1000L / 48000L, vendor, sawEos)
  }

  // ----- synth (fixture encoder; same framing, opposite direction) ------

  def channelsOf(id: Long): Int = 1 + (id % 2).toInt
  def preSkipOf(id: Long): Int = 312 + (id % 5).toInt * 10
  def inputRateOf(id: Long): Long = if (id % 2 == 0) 44100L else 16000L
  def nPacketsOf(id: Long): Int = 8 + (id % 7).toInt
  def packetLen(id: Long, j: Int): Int = (40 + ((id * 11 + j * 37) % 500)).toInt

  private def page(htype: Int, granule: Long, serial: Long, seq: Long,
      segs: Seq[Array[Byte]], closeLast: Boolean): Array[Byte] = {
    // segs: full packets (or a leading/trailing fragment); the caller
    // passes fragments only at page edges with the right htype
    val lacing = scala.collection.mutable.ArrayBuffer[Int]()
    val body = new java.io.ByteArrayOutputStream()
    for ((s, idx) <- segs.zipWithIndex) {
      var rem = s.length
      body.write(s)
      while (rem >= 255) { lacing += 255; rem -= 255 }
      if (rem < 255 && (idx < segs.length - 1 || closeLast)) lacing += rem
      // an open-ended final fragment whose length ≡ 0 (mod 255) needs
      // no terminator; one with a sub-255 tail is impossible to leave
      // open, so callers split fragments at 255 boundaries
      else if (rem != 0) lacing += rem
    }
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write("OggS".getBytes(US_ASCII))
    hdr.write(0); hdr.write(htype)
    var i = 0
    while (i < 8) { hdr.write(((granule >>> (8 * i)) & 0xFF).toInt); i += 1 }
    i = 0
    while (i < 4) { hdr.write(((serial >>> (8 * i)) & 0xFF).toInt); i += 1 }
    i = 0
    while (i < 4) { hdr.write(((seq >>> (8 * i)) & 0xFF).toInt); i += 1 }
    hdr.write(Array[Byte](0, 0, 0, 0))                  // crc placeholder
    hdr.write(lacing.length)
    lacing.foreach(hdr.write)
    val out = hdr.toByteArray ++ body.toByteArray
    val crc = oggCrc(out, 0, out.length)
    i = 0
    while (i < 4) { out(22 + i) = ((crc >>> (8 * i)) & 0xFF).toByte; i += 1 }
    out
  }

  /** A real Ogg/Opus stream for doc `id`: bos page with OpusHead, a
    * tags page, then audio packets at 3 per page (960 samples each at
    * 48 kHz), with one packet SPLIT across a page boundary (continued
    * flag + 255-lacing tail) for every 3rd id. */
  def encode(id: Long): Array[Byte] = {
    val serial = 0x5EED0000L + (id % 1000)
    val out = new java.io.ByteArrayOutputStream()
    val head = new java.io.ByteArrayOutputStream()
    head.write("OpusHead".getBytes(US_ASCII))
    head.write(1); head.write(channelsOf(id))
    head.write(preSkipOf(id) & 0xFF); head.write((preSkipOf(id) >> 8) & 0xFF)
    var i = 0
    while (i < 4) { head.write(((inputRateOf(id) >>> (8 * i)) & 0xFF).toInt); i += 1 }
    head.write(0); head.write(0); head.write(0)         // gain, family 0
    out.write(page(2, 0L, serial, 0L, Seq(head.toByteArray), closeLast = true))
    val vendor = "graft-synth".getBytes(US_ASCII)
    val tags = new java.io.ByteArrayOutputStream()
    tags.write("OpusTags".getBytes(US_ASCII))
    tags.write(vendor.length); tags.write(0); tags.write(0); tags.write(0)
    tags.write(vendor)
    tags.write(Array[Byte](0, 0, 0, 0))                 // zero comments
    out.write(page(0, 0L, serial, 1L, Seq(tags.toByteArray), closeLast = true))
    val n = nPacketsOf(id)
    val pkts = (0 until n).map { j =>
      val l = packetLen(id, j)
      Array.tabulate[Byte](l)(k => ((id * 5 + j * 17 + k) % 250).toByte)
    }
    var seq = 2L
    var granule = preSkipOf(id).toLong
    var j = 0
    while (j < n) {
      val group = pkts.slice(j, math.min(j + 3, n))
      granule += 960L * group.length
      val isLastGroup = j + 3 >= n
      if (id % 3 == 0 && !isLastGroup && group.length == 3) {
        // split the group's LAST packet: first fragment ends this page
        // at a 255 boundary (stays open), remainder continues next page
        val last = group.last
        val cut = (last.length / 255) * 255
        if (cut > 0) {
          out.write(page(0, -1L, serial, seq,
            group.init :+ last.take(cut), closeLast = false))
          seq += 1
          out.write(page(1, granule, serial, seq,
            Seq(last.drop(cut)), closeLast = true))
          seq += 1
        } else {
          out.write(page(0, granule, serial, seq, group, closeLast = true))
          seq += 1
        }
      } else {
        out.write(page(if (isLastGroup) 4 else 0, granule, serial, seq,
          group, closeLast = true))
        seq += 1
      }
      j += 3
    }
    out.toByteArray
  }
}
