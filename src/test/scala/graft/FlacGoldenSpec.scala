package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FlacCodec

/** Golden FLAC byte vectors assembled BY HAND from the published spec
  * (RFC 9639 / the classic xiph format document) — never through
  * [[FlacCodec]]'s encoder — and decoded to pinned PCM. The
  * self-round-trip tests prove encoder/decoder consistency; these
  * prove the decoder against the WIRE FORMAT itself: a
  * non-conformant-but-self-consistent codec pair would pass the
  * round-trip and fail here. Each vector is built bit-by-bit with a
  * test-local writer: STREAMINFO framing, frame-header sync/codes and
  * CRC-8, subframe type bits (constant, verbatim, fixed order 2,
  * left/side stereo), Rice residual coding, byte-align padding, and
  * the whole-frame CRC-16 all come from the spec text alone. */
class FlacGoldenSpec extends AnyFunSuite {

  // ---- test-local bit writer (MSB-first, the FLAC bit order) ----
  private final class BW {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); n += 1
      if (n == 8) { out.write(acc); acc = 0; n = 0 }
    }
    def bits(v: Long, w: Int): Unit = {
      var k = w - 1
      while (k >= 0) { bit(((v >> k) & 1L).toInt); k -= 1 }
    }
    def align(): Unit = while (n != 0) bit(0)
    def bytes: Array[Byte] = { require(n == 0, "unaligned"); out.toByteArray }
  }

  // spec CRCs (poly 0x07 init 0; poly 0x8005 init 0), bitwise
  private def crc8(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= x & 0xFF
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF
            else (c << 1) & 0xFF
        k += 1
      }
    }
    c
  }
  private def crc16(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xFF) << 8
      var k = 0
      while (k < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
            else (c << 1) & 0xFFFF
        k += 1
      }
    }
    c
  }

  /** fLaC marker + last-block STREAMINFO: blocksizes 16/16, rate
    * 44100, 16-bit, `channels`, `total` samples, PCM md5. */
  private def header(channels: Int, total: Long, md5: Array[Byte],
      bps: Int = 16): Array[Byte] = {
    val w = new BW
    "fLaC".getBytes("US-ASCII").foreach(b => w.bits(b & 0xFFL, 8))
    w.bits(1, 1); w.bits(0, 7)   // last-metadata-block, type 0
    w.bits(34, 24)               // STREAMINFO length
    w.bits(16, 16); w.bits(16, 16) // min/max blocksize
    w.bits(0, 24); w.bits(0, 24)   // min/max framesize unknown
    w.bits(44100, 20)
    w.bits(channels - 1L, 3)
    w.bits(bps - 1L, 5)          // bps - 1
    w.bits(total, 36)
    md5.foreach(b => w.bits(b & 0xFFL, 8))
    w.bytes
  }

  /** Frame header for blocksize 16 (code 6 + 8-bit bs-1), rate from
    * STREAMINFO, with CRC-8 appended. Sample-size code from bps
    * (RFC 9639 frame-header table: 1=8, 4=16, 6=24). */
  private def frameHead(chanCode: Int, frameNo: Int, bps: Int = 16)
      : Array[Byte] = {
    val ssCode = bps match { case 8 => 1; case 16 => 4; case 24 => 6 }
    val w = new BW
    w.bits(0x3FFE, 14)           // sync
    w.bits(0, 1); w.bits(0, 1)   // reserved, fixed-blocksize strategy
    w.bits(6, 4)                 // blocksize: 8-bit bs-1 follows
    w.bits(0, 4)                 // sample rate: from STREAMINFO
    w.bits(chanCode.toLong, 4)
    w.bits(ssCode.toLong, 3)     // sample size
    w.bits(0, 1)                 // reserved
    w.bits(frameNo.toLong, 8)    // UTF-8 coded number (< 0x80)
    w.bits(15, 8)                // blocksize - 1
    val h = w.bytes
    h :+ crc8(h).toByte
  }

  private def withCrc16(frame: Array[Byte]): Array[Byte] = {
    val c = crc16(frame)
    frame ++ Array(((c >> 8) & 0xFF).toByte, (c & 0xFF).toByte)
  }

  private def pcmMd5(chans: Array[Array[Int]], bps: Int = 16)
      : Array[Byte] = {
    val bytesPer = (bps + 7) / 8
    val md = java.security.MessageDigest.getInstance("MD5")
    for (i <- chans(0).indices; c <- chans.indices; k <- 0 until bytesPer)
      md.update(((chans(c)(i) >> (8 * k)) & 0xFF).toByte)
    md.digest()
  }

  test("golden vector 1: constant + verbatim subframes across two " +
      "frames decode to the pinned PCM (MD5 gate live)") {
    val verb = Array(12, -7, 130, -32768, 32767, 0, 1, -1,
      999, -999, 250, -251, 77, 78, -12345, 4096)
    val expected = Array(Array.fill(16)(1234) ++ verb)
    // frame 0: constant subframe, value 1234
    val f0 = {
      val w = new BW
      w.bits(0, 1); w.bits(0, 6); w.bits(0, 1) // pad, CONSTANT, no wasted
      w.bits(1234L, 16)
      w.align()
      frameHead(0, 0) ++ w.bytes
    }
    // frame 1: verbatim subframe, 16 pinned samples
    val f1 = {
      val w = new BW
      w.bits(0, 1); w.bits(1, 6); w.bits(0, 1) // VERBATIM
      verb.foreach(v => w.bits(v.toLong & 0xFFFF, 16))
      w.align()
      frameHead(0, 1) ++ w.bytes
    }
    val stream = header(1, 32, pcmMd5(expected)) ++
      withCrc16(f0) ++ withCrc16(f1)
    val audio = FlacCodec.decode(stream)
    assert(audio.sampleRate == 44100 && audio.channels == 1)
    assert(audio.mono.toSeq == expected(0).toSeq)
    // flip one payload bit -> the CRC-16 must catch it
    val corrupt = stream.clone()
    corrupt(stream.length - 10) = (corrupt(stream.length - 10) ^ 4).toByte
    intercept[Exception] { FlacCodec.decode(corrupt) }
  }

  test("golden vector 2: fixed order-2 predictor with Rice residuals " +
      "(param 0, zero residue) reconstructs the ramp exactly") {
    val expected = Array((0 until 16).map(i => 100 + 10 * i).toArray)
    val f = {
      val w = new BW
      // subframe: pad, FIXED order 2 (001010), no wasted bits
      w.bits(0, 1); w.bits(0x0A, 6); w.bits(0, 1)
      w.bits(100L, 16); w.bits(110L, 16) // warmup
      w.bits(0, 2)  // residual method: 4-bit Rice
      w.bits(0, 4)  // partition order 0 -> one partition
      w.bits(0, 4)  // Rice parameter 0
      // 14 residuals of 0: zigzag 0, quotient 0 -> a lone stop bit
      (0 until 14).foreach(_ => w.bit(1))
      w.align()
      frameHead(0, 0) ++ w.bytes
    }
    val stream = header(1, 16, pcmMd5(expected)) ++ withCrc16(f)
    val audio = FlacCodec.decode(stream)
    assert(audio.mono.toSeq == expected(0).toSeq)
  }

  test("golden vector 3: left/side stereo with a 17-bit side channel " +
      "reconstructs both channels (L=1000, R=700)") {
    val expected = Array(Array.fill(16)(1000), Array.fill(16)(700))
    val f = {
      val w = new BW
      // subframe 0 (left, 16-bit): constant 1000
      w.bits(0, 1); w.bits(0, 6); w.bits(0, 1)
      w.bits(1000L, 16)
      // subframe 1 (side = L-R, 17-bit): constant 300
      w.bits(0, 1); w.bits(0, 6); w.bits(0, 1)
      w.bits(300L, 17)
      w.align()
      frameHead(8, 0) ++ w.bytes // chanCode 8: left/side
    }
    val stream = header(2, 16, pcmMd5(expected)) ++ withCrc16(f)
    val audio = FlacCodec.decode(stream)
    assert(audio.channels == 2)
    assert(audio.samples(0).toSeq == expected(0).toSeq)
    assert(audio.samples(1).toSeq == expected(1).toSeq)
    // a wrong STREAMINFO md5 must reject even though frames are valid
    val bad = header(2, 16, Array.fill[Byte](16)(1)) ++ withCrc16(f)
    val ex = intercept[Exception] { FlacCodec.decode(bad) }
    assert(ex.getMessage.contains("MD5"), ex.getMessage)
  }

  test("golden vector 5: an ESCAPE-coded residual partition (param " +
      "0b11111, 5-bit raw width) decodes through the order-0 fixed " +
      "predictor") {
    // order-0 fixed: s(i) = r(i) — residuals ARE the samples; escape
    // coding stores them as raw two's-complement at a declared width
    val vals = Array(-16, 15, -1, 0, 7, -8, 3, -3, 11, -12, 5, -6,
      1, -2, 9, -10)
    val expected = Array(vals)
    val f = {
      val w = new BW
      w.bits(0, 1); w.bits(0x08, 6); w.bits(0, 1) // FIXED order 0
      w.bits(0, 2)       // residual method: 4-bit Rice params
      w.bits(0, 4)       // partition order 0
      w.bits(0xF, 4)     // ESCAPE: raw-width residuals follow
      w.bits(5, 5)       // raw width: 5 bits
      vals.foreach(v => w.bits(v.toLong & 0x1F, 5))
      w.align()
      frameHead(0, 0) ++ w.bytes
    }
    val stream = header(1, 16, pcmMd5(expected)) ++ withCrc16(f)
    assert(FlacCodec.decode(stream).mono.toSeq == expected(0).toSeq)
  }

  test("golden vector 6: wasted bits (trailing zero LSBs declared in " +
      "the subframe header) scale a constant subframe back up") {
    // wasted-bits unary count k=2: samples stored at bps-2 and shifted
    // left 2 on output — 300 << 2 = 1200
    val expected = Array(Array.fill(16)(1200))
    val f = {
      val w = new BW
      w.bits(0, 1); w.bits(0, 6) // pad, CONSTANT
      w.bits(1, 1)               // wasted-bits flag
      w.bit(0); w.bit(1)         // unary k-1=1 -> k=2 wasted bits
      w.bits(300L, 14)           // constant at effective bps 16-2
      w.align()
      frameHead(0, 0) ++ w.bytes
    }
    val stream = header(1, 16, pcmMd5(expected)) ++ withCrc16(f)
    assert(FlacCodec.decode(stream).mono.toSeq == expected(0).toSeq)
  }

  test("golden vector 4: Rice residuals with a nonzero parameter and " +
      "sign zigzag decode a sawtooth through the order-1 predictor") {
    // s(0)=0 warmup; residuals r(i) = s(i) - s(i-1) alternate +5/-5
    val expected = Array((0 until 16).map(i =>
      if (i == 0) 0 else if (i % 2 == 1) 5 else 0).toArray)
    val f = {
      val w = new BW
      w.bits(0, 1); w.bits(0x09, 6); w.bits(0, 1) // FIXED order 1
      w.bits(0L, 16)                              // warmup s(0)=0
      w.bits(0, 2); w.bits(0, 4)                  // rice4, 1 partition
      w.bits(2, 4)                                // Rice parameter 2
      (1 until 16).foreach { i =>
        val v = if (i % 2 == 1) 5L else -5L
        val zz = if (v >= 0) v << 1 else (-v << 1) - 1
        val q = (zz >> 2).toInt
        (0 until q).foreach(_ => w.bit(0))        // unary quotient
        w.bit(1)
        w.bits(zz & 3L, 2)                        // remainder
      }
      w.align()
      frameHead(0, 0) ++ w.bytes
    }
    val stream = header(1, 16, pcmMd5(expected)) ++ withCrc16(f)
    assert(FlacCodec.decode(stream).mono.toSeq == expected(0).toSeq)
  }

  test("golden vector 7: a 24-bit stream (STREAMINFO bps 24, frame " +
      "sample-size code 6) decodes verbatim + fixed subframes across " +
      "two frames with the 3-byte-per-sample MD5 gate live") {
    // frame 0: verbatim, full ±2^23 span; frame 1: fixed order 1 ramp
    // (step 65536 — a residual no 16-bit path could carry)
    val verb = Array(8388607, -8388608, 70000, -70000, 0, 1, -1,
      1234567, -7654321, 99, -100, 4660, 2882343, -2882343, 16, -17)
    val ramp = (0 until 16).map(i => -500000 + 65536 * i).toArray
    val expected = Array(verb ++ ramp)
    val f0 = {
      val w = new BW
      w.bits(0, 1); w.bits(1, 6); w.bits(0, 1) // VERBATIM
      verb.foreach(v => w.bits(v.toLong & 0xFFFFFF, 24))
      w.align()
      frameHead(0, 0, bps = 24) ++ w.bytes
    }
    val f1 = {
      val w = new BW
      w.bits(0, 1); w.bits(0x09, 6); w.bits(0, 1) // FIXED order 1
      w.bits(ramp(0).toLong & 0xFFFFFF, 24)       // warmup
      w.bits(0, 2); w.bits(0, 4)                  // rice4, 1 partition
      w.bits(0xF, 4)                              // ESCAPE
      w.bits(18, 5)                               // raw width 18
      (1 until 16).foreach(_ => w.bits(65536L & 0x3FFFF, 18))
      w.align()
      frameHead(0, 1, bps = 24) ++ w.bytes
    }
    val stream = header(1, 32, pcmMd5(expected, bps = 24), bps = 24) ++
      withCrc16(f0) ++ withCrc16(f1)
    val audio = FlacCodec.decode(stream)
    assert(audio.sampleRate == 44100 && audio.channels == 1)
    assert(audio.mono.toSeq == expected(0).toSeq)
    // the 24-bit MD5 walk is live: a wrong digest rejects
    val bad = header(1, 32, Array.fill[Byte](16)(3), bps = 24) ++
      withCrc16(f0) ++ withCrc16(f1)
    val ex = intercept[Exception] { FlacCodec.decode(bad) }
    assert(ex.getMessage.contains("MD5"), ex.getMessage)
  }
}
