package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mp3Codec

/** MP3 frame walk: spec-derived goldens (the frame-length formula and
  * kbps/rate tables are public ISO 11172-3 facts — the 0xFFFB9040
  * 128kbps/44.1kHz header is the best-known byte string in audio),
  * Xing/Info tag-frame handling, tag parsing, and strict rejection. */
class Mp3CodecSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("golden: FF FB 90 40 is one 417-byte MPEG1 L3 128kbps 44.1kHz frame") {
    // 144000 * 128 / 44100 = 417 (floor), samples/frame 1152
    val frame = new Array[Byte](417)
    System.arraycopy(b(0xFF, 0xFB, 0x90, 0x40), 0, frame, 0, 4)
    val info = Mp3Codec.walk(frame)
    assert(info != null)
    assert(info.versionName == "MPEG1" && info.layer == 3)
    assert(info.sampleRate == 44100 && info.channels == 2)
    assert(info.nFrames == 1 && info.totalSamples == 1152)
    assert(info.avgKbps == 128 && !info.vbr)
    assert(info.durationMs == 1152L * 1000 / 44100)
    // padding bit adds exactly one byte
    val padded = new Array[Byte](418)
    System.arraycopy(b(0xFF, 0xFB, 0x92, 0x40), 0, padded, 0, 4)
    assert(Mp3Codec.walk(padded) != null)
    // ...and a 417-byte padded frame is a truncation -> reject
    assert(Mp3Codec.walk(java.util.Arrays.copyOf(padded, 417)) == null)
  }

  test("golden: Layer II and Layer I frame lengths (public tables)") {
    // MPEG1 L2 192kbps idx 10, 44.1k: 144000*192/44100 = 626
    val l2 = new Array[Byte](626)
    System.arraycopy(b(0xFF, 0xFD, 0xA0, 0x40), 0, l2, 0, 4)
    val i2 = Mp3Codec.walk(l2)
    assert(i2 != null && i2.layer == 2 && i2.totalSamples == 1152)
    assert(i2.avgKbps == 192)
    // MPEG1 L1 448kbps idx 14, 44.1k: (12000*448/44100 + 0)*4 = 484
    val l1 = new Array[Byte](484)
    System.arraycopy(b(0xFF, 0xFF, 0xE0, 0x40), 0, l1, 0, 4)
    val i1 = Mp3Codec.walk(l1)
    assert(i1 != null && i1.layer == 1 && i1.totalSamples == 384)
    assert(i1.avgKbps == 448)
    // MPEG2 L3 64kbps idx 8, 24kHz: 72000*64/24000 = 192, spf 576
    val v2 = new Array[Byte](192)
    System.arraycopy(b(0xFF, 0xF3, 0x84, 0x40), 0, v2, 0, 4)
    val iv2 = Mp3Codec.walk(v2)
    assert(iv2 != null && iv2.versionName == "MPEG2" && iv2.totalSamples == 576)
  }

  test("synth round-trips match the closed-form formulas, Xing frame excluded") {
    for (id <- 0L until 40L) {
      val info = Mp3Codec.walk(Mp3Codec.encode(id))
      assert(info != null, s"id $id rejected")
      assert(info.nFrames == Mp3Codec.nAudioFrames(id), s"id $id frames")
      assert(info.xingFrames == Mp3Codec.nAudioFrames(id), s"id $id xing")
      assert(info.vbr == (id % 3 == 0), s"id $id vbr")
      assert(info.sampleRate == Mp3Codec.rateOf(id))
      assert(info.channels == (if (id % 4 == 2) 1 else 2))
      assert(info.hasId3v2 == (id % 2 == 0))
      assert(info.hasId3v1 == (id % 4 == 1))
      assert(Option(info.id3Title) ==
        (if (id % 2 == 0) Some(s"track$id") else None))
      val spf = if (id % 3 == 0) 1152 else 576
      assert(info.durationMs ==
        Mp3Codec.nAudioFrames(id).toLong * spf * 1000 / Mp3Codec.rateOf(id))
      val kbps = (0 until Mp3Codec.nAudioFrames(id)).map(Mp3Codec.frameKbps(id, _))
      assert(info.avgKbps == kbps.sum / kbps.length, s"id $id kbps")
    }
  }

  test("strict rejection: truncation, splice, free-format, bad indices, junk") {
    val good = Mp3Codec.encode(6L)
    for (n <- Seq(3, 10, good.length / 2, good.length - 1))
      assert(Mp3Codec.walk(java.util.Arrays.copyOf(good, n)) == null, s"n=$n")
    // splice: an MPEG1 stream followed by an MPEG2 stream
    val splice = Mp3Codec.encode(3L) ++ Mp3Codec.encode(4L)
    assert(Mp3Codec.walk(splice) == null)
    // free-format (bitrate idx 0) and invalid idx 15 reject
    assert(Mp3Codec.walk(b(0xFF, 0xFB, 0x00, 0x40) ++ new Array[Byte](413)) == null)
    assert(Mp3Codec.walk(b(0xFF, 0xFB, 0xF0, 0x40) ++ new Array[Byte](413)) == null)
    // reserved samplerate index 3 and reserved version reject
    assert(Mp3Codec.walk(b(0xFF, 0xFB, 0x9C, 0x40) ++ new Array[Byte](413)) == null)
    assert(Mp3Codec.walk(b(0xFF, 0xEB, 0x90, 0x40) ++ new Array[Byte](413)) == null)
    // ID3v2 with a non-syncsafe size byte rejects
    assert(Mp3Codec.walk(b(0x49, 0x44, 0x33, 3, 0, 0, 0x80, 0, 0, 10)) == null)
    // trailing garbage after the last frame rejects (not TAG, not sync)
    assert(Mp3Codec.walk(Mp3Codec.encode(6L) ++ b(1, 2, 3)) == null)
    assert(Mp3Codec.walk(Array.emptyByteArray) == null)
  }

  test("fuzz: pseudo-random buffers never throw") {
    var x = 0xBEEF1234L
    def nx(): Int = { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 33).toInt }
    for (_ <- 0 until 500) {
      val len = math.abs(nx()) % 2000
      val buf = Array.tabulate[Byte](len)(_ => nx().toByte)
      Mp3Codec.walk(buf)                  // must not throw
      if (len > 4) {
        buf(0) = 0xFF.toByte; buf(1) = (buf(1) | 0xE0).toByte
        Mp3Codec.walk(buf)
      }
    }
  }
}
