package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** Clean-room MP3 stream walk (ISO/IEC 11172-3 / 13818-3 frame headers
  * plus the de-facto ID3v2.3 / ID3v1 / Xing-Info conventions every real
  * MP3 carries). The reference decodes no media at all; this is the
  * audio-corpus census path — MP3 is what web-crawled and podcast audio
  * actually ships as, and the questions a curation pipeline asks
  * (duration, sample rate, CBR/VBR, frame integrity, tag presence) need
  * only the frame HEADERS, never the MDCT audio. A full psychoacoustic
  * decoder would be thousands of lines to reconstruct samples nothing
  * downstream consumes; the walk is the honest scope, and it verifies
  * every frame's sync/consistency rather than trusting the first header
  * (truncated or spliced files reject, like every other codec here).
  *
  * Wire facts used (all from the public spec):
  *   - 32-bit header: 11-bit sync, 2-bit version (00=MPEG2.5 01=reserved
  *     10=MPEG2 11=MPEG1), 2-bit layer (01=III 10=II 11=I), CRC bit,
  *     4-bit bitrate index, 2-bit samplerate index, padding bit, private
  *     bit, 2-bit channel mode, ...
  *   - Layer III frame bytes = (MPEG1 ? 144000 : 72000)·kbps/rate + pad
  *     (Layer II 144000·kbps/rate + pad; Layer I (12000·kbps/rate+pad)·4)
  *   - samples/frame: L3 1152 (MPEG1) / 576 (MPEG2, 2.5); L2 1152; L1 384
  *   - ID3v2 prefix: "ID3" + version(2) + flags(1) + 28-bit SYNCSAFE size
  *   - ID3v1 suffix: fixed 128-byte "TAG" record
  *   - Xing/Info: in the FIRST frame, right after the side info (whose
  *     size depends on version × channel mode) — "Xing" marks VBR,
  *     "Info" CBR; flag bit 0 carries the encoder's frame count.
  */
object Mp3Codec {

  /** kbps tables, Layer III (index 0 = free format, 15 = invalid). */
  private val KbpsV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val KbpsV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val KbpsV1L2 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val KbpsV1L1 =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)

  /** Hz by (version, index); version 0=MPEG1, 1=MPEG2, 2=MPEG2.5. */
  private val Rates = Array(
    Array(44100, 48000, 32000),
    Array(22050, 24000, 16000),
    Array(11025, 12000, 8000))

  final case class Mp3Info(
      versionName: String,      // "MPEG1" | "MPEG2" | "MPEG2.5"
      layer: Int,               // 1 | 2 | 3
      sampleRate: Int,
      channels: Int,            // 1 | 2
      nFrames: Int,             // audio frames (Xing/Info frame excluded)
      totalSamples: Long,
      durationMs: Long,
      vbr: Boolean,             // "Xing" tag, or bitrate varies
      avgKbps: Int,             // floor(mean frame kbps)
      hasId3v2: Boolean,
      id3Title: String,         // null when untagged
      hasId3v1: Boolean,
      xingFrames: Int)          // encoder-declared count (-1 when absent)

  // ----- walk -----------------------------------------------------------

  /** Strict walk: null (never throws) on anything that is not a clean
    * frame chain — lost sync, reserved version/layer, free-format or
    * invalid bitrate index, reserved samplerate, a frame overrunning the
    * buffer, or trailing bytes that are neither a next frame nor an
    * ID3v1 trailer. Mixed version/layer/rate mid-stream rejects too
    * (spliced files); bitrate MAY vary — that's VBR. */
  def walk(b: Array[Byte]): Mp3Info = {
    var p = 0
    val end = b.length
    var hasId3v2 = false
    var title: String = null
    // ID3v2 prefix
    if (end >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      if ((b(6) & 0x80) != 0 || (b(7) & 0x80) != 0 ||
        (b(8) & 0x80) != 0 || (b(9) & 0x80) != 0) return null // not syncsafe
      val size = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      if (10 + size > end) return null
      title = id3v2Title(b, 10, 10 + size)
      hasId3v2 = true
      p = 10 + size
    }
    var ver = -1
    var layer = -1
    var rate = -1
    var channels = -1
    var nFrames = 0
    var kbpsSum = 0L
    var vbrTag = false
    var xingFrames = -1
    var minKbps = Int.MaxValue
    var maxKbps = 0
    var first = true
    while (p < end && !(end - p == 128 && b(p) == 'T' && b(p + 1) == 'A' &&
        b(p + 2) == 'G')) {
      if (p + 4 > end) return null
      if ((b(p) & 0xFF) != 0xFF || (b(p + 1) & 0xE0) != 0xE0) return null
      val v = (b(p + 1) >> 3) & 3         // 0=2.5 1=res 2=MPEG2 3=MPEG1
      if (v == 1) return null
      val vi = if (v == 3) 0 else if (v == 2) 1 else 2
      val l = (b(p + 1) >> 1) & 3         // 1=III 2=II 3=I
      if (l == 0) return null
      val li = 4 - l                      // 1|2|3 layer number
      val bi = (b(p + 2) >> 4) & 0xF
      if (bi == 0 || bi == 15) return null // free format / invalid: reject
      val ri = (b(p + 2) >> 2) & 3
      if (ri == 3) return null
      val pad = (b(p + 2) >> 1) & 1
      val mode = (b(p + 3) >> 6) & 3
      val ch = if (mode == 3) 1 else 2
      val kbps = (vi, li) match {
        case (0, 3) => KbpsV1L3(bi)
        case (_, 3) => KbpsV2L3(bi)
        case (0, 2) => KbpsV1L2(bi)
        case (0, 1) => KbpsV1L1(bi)
        case _ => return null             // MPEG2 L1/L2 out of subset scope
      }
      val hz = Rates(vi)(ri)
      val flen = li match {
        case 3 => (if (vi == 0) 144000 else 72000) * kbps / hz + pad
        case 2 => 144000 * kbps / hz + pad
        case _ => (12000 * kbps / hz + pad) * 4
      }
      if (flen < 24 || p + flen > end) return null
      if (ver < 0) { ver = vi; layer = li; rate = hz; channels = ch }
      else if (vi != ver || li != layer || hz != rate || ch != channels)
        return null
      // Xing/Info lives in the FIRST frame only, after the side info
      var counted = true
      if (first && li == 3) {
        val side = if (vi == 0) { if (ch == 1) 17 else 32 }
          else { if (ch == 1) 9 else 17 }
        val t = p + 4 + side
        if (t + 8 <= p + flen) {
          val tag = new String(b, t, 4, US_ASCII)
          if (tag == "Xing" || tag == "Info") {
            vbrTag = tag == "Xing"
            counted = false               // the tag frame is not audio
            val flags = ((b(t + 4) & 0xFF) << 24) | ((b(t + 5) & 0xFF) << 16) |
              ((b(t + 6) & 0xFF) << 8) | (b(t + 7) & 0xFF)
            if ((flags & 1) != 0 && t + 12 <= p + flen)
              xingFrames = ((b(t + 8) & 0xFF) << 24) | ((b(t + 9) & 0xFF) << 16) |
                ((b(t + 10) & 0xFF) << 8) | (b(t + 11) & 0xFF)
          }
        }
      }
      if (counted) {
        nFrames += 1
        kbpsSum += kbps
        if (kbps < minKbps) minKbps = kbps
        if (kbps > maxKbps) maxKbps = kbps
      }
      first = false
      p += flen
    }
    val hasId3v1 = p < end                // loop exits early only on TAG
    if (nFrames == 0) return null
    val spf = if (layer == 3) { if (ver == 0) 1152 else 576 }
      else if (layer == 2) 1152 else 384
    val totalSamples = nFrames.toLong * spf
    Mp3Info(
      versionName = ver match { case 0 => "MPEG1"; case 1 => "MPEG2"; case _ => "MPEG2.5" },
      layer = layer,
      sampleRate = rate,
      channels = channels,
      nFrames = nFrames,
      totalSamples = totalSamples,
      durationMs = totalSamples * 1000L / rate,
      vbr = vbrTag || minKbps != maxKbps,
      avgKbps = (kbpsSum / nFrames).toInt,
      hasId3v2 = hasId3v2,
      id3Title = title,
      hasId3v1 = hasId3v1,
      xingFrames = xingFrames)
  }

  /** First TIT2 text (ID3v2.3: plain big-endian frame sizes, latin-1
    * encoding byte 0); null when absent or non-latin1. */
  private def id3v2Title(b: Array[Byte], from: Int, to: Int): String = {
    var p = from
    while (p + 10 <= to) {
      val id = new String(b, p, 4, US_ASCII)
      val size = ((b(p + 4) & 0xFF) << 24) | ((b(p + 5) & 0xFF) << 16) |
        ((b(p + 6) & 0xFF) << 8) | (b(p + 7) & 0xFF)
      if (size < 0 || p + 10 + size > to) return null
      if (id == "TIT2" && size >= 1 && b(p + 10) == 0)
        return new String(b, p + 11, size - 1, US_ASCII)
      if (b(p) == 0) return null               // padding region
      p += 10 + size
    }
    null
  }

  // ----- synth (fixture encoder; same header math, opposite direction) --

  def nAudioFrames(id: Long): Int = 6 + (id % 5).toInt
  def verIdx(id: Long): Int = (id % 3).toInt            // 0=MPEG1 1=2 2=2.5
  def rateOf(id: Long): Int = Rates(verIdx(id))((id % 3).toInt)
  def isVbr(id: Long): Boolean = id % 3 == 0            // MPEG1 ids carry Xing
  def mono(id: Long): Boolean = id % 4 == 2
  def frameKbpsIdx(id: Long, j: Int): Int =
    if (isVbr(id)) 9 + ((id + j) % 4).toInt else 9 + (id % 4).toInt
  def frameKbps(id: Long, j: Int): Int =
    (if (verIdx(id) == 0) KbpsV1L3 else KbpsV2L3)(frameKbpsIdx(id, j))
  def framePad(id: Long, j: Int): Int = if ((id + j) % 3 == 0) 1 else 0

  private def header(vi: Int, kbpsIdx: Int, rateIdx: Int, pad: Int,
      mono: Boolean): Array[Byte] = {
    val vBits = if (vi == 0) 3 else if (vi == 1) 2 else 0
    Array[Byte](0xFF.toByte,
      (0xE0 | (vBits << 3) | (1 << 1) | 1).toByte,       // layer III, no CRC
      ((kbpsIdx << 4) | (rateIdx << 2) | (pad << 1)).toByte,
      (if (mono) 0xC0 else 0x40).toByte)                 // mode + zeros
  }

  private def frameLen(vi: Int, kbps: Int, hz: Int, pad: Int): Int =
    (if (vi == 0) 144000 else 72000) * kbps / hz + pad

  /** A real MP3 stream for doc `id`: optional ID3v2.3 TIT2 tag (even
    * ids), a Xing (VBR, id%3==0) or Info (CBR) tag frame, nAudioFrames
    * audio frames with deterministic junk payloads (no byte is 0xFF, so
    * the only syncs are real headers), optional ID3v1 trailer
    * (id%4==1). */
  def encode(id: Long): Array[Byte] = {
    val vi = verIdx(id)
    val ri = (id % 3).toInt
    val hz = rateOf(id)
    val isMono = mono(id)
    val out = new java.io.ByteArrayOutputStream()
    if (id % 2 == 0) {
      val title = s"track$id".getBytes(US_ASCII)
      val frame = "TIT2".getBytes(US_ASCII) ++
        Array[Byte](0, 0, 0, (title.length + 1).toByte, 0, 0, 0.toByte) ++ title
      val size = frame.length
      out.write("ID3".getBytes(US_ASCII))
      out.write(3); out.write(0); out.write(0)           // v2.3.0, no flags
      out.write((size >> 21) & 0x7F); out.write((size >> 14) & 0x7F)
      out.write((size >> 7) & 0x7F); out.write(size & 0x7F)
      out.write(frame)
    }
    // tag frame (Xing for VBR ids, Info for CBR), bitrate index 9, no pad
    val tagKbps = (if (vi == 0) KbpsV1L3 else KbpsV2L3)(9)
    val tagLen = frameLen(vi, tagKbps, hz, 0)
    val tagFrame = new Array[Byte](tagLen)
    System.arraycopy(header(vi, 9, ri, 0, isMono), 0, tagFrame, 0, 4)
    val side = if (vi == 0) { if (isMono) 17 else 32 }
      else { if (isMono) 9 else 17 }
    val tag = (if (isVbr(id)) "Xing" else "Info").getBytes(US_ASCII)
    System.arraycopy(tag, 0, tagFrame, 4 + side, 4)
    val nf = nAudioFrames(id)
    tagFrame(4 + side + 4 + 3) = 1                       // flags: frames
    tagFrame(4 + side + 8) = ((nf >> 24) & 0xFF).toByte
    tagFrame(4 + side + 9) = ((nf >> 16) & 0xFF).toByte
    tagFrame(4 + side + 10) = ((nf >> 8) & 0xFF).toByte
    tagFrame(4 + side + 11) = (nf & 0xFF).toByte
    out.write(tagFrame)
    var j = 0
    while (j < nf) {
      val kidx = frameKbpsIdx(id, j)
      val kbps = frameKbps(id, j)
      val pad = framePad(id, j)
      val len = frameLen(vi, kbps, hz, pad)
      val f = new Array[Byte](len)
      System.arraycopy(header(vi, kidx, ri, pad, isMono), 0, f, 0, 4)
      var k = 4
      while (k < len) { f(k) = ((id * 7 + j * 13 + k) % 251).toByte; k += 1 }
      out.write(f)
      j += 1
    }
    if (id % 4 == 1) {
      val t = new Array[Byte](128)
      System.arraycopy("TAG".getBytes(US_ASCII), 0, t, 0, 3)
      val name = s"track$id".getBytes(US_ASCII)
      System.arraycopy(name, 0, t, 3, math.min(30, name.length))
      out.write(t)
    }
    out.toByteArray
  }
}
