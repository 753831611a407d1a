package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FlacCodec

/** The FLAC subset codec: bit-exact PCM round-trips through fixed AND
  * LPC subframes across multi-frame streams, CRC-8/CRC-16 tamper
  * detection, the STREAMINFO MD5 end-to-end gate, the Rice escape
  * hatch, and hand-built streams covering the subframe/partition
  * variants the fixture encoder doesn't emit (constant, verbatim,
  * 5-bit Rice, partition order > 0, wasted bits). */
class FlacSpec extends AnyFunSuite {

  private def formulaPcm(id: Long): Array[Int] =
    Array.tabulate(FlacCodec.nSamples(id))(i => FlacCodec.sample(id, i))

  test("decode(encode(id)) is bit-exact PCM for fixed (even id) and " +
      "LPC (odd id) across multi-frame streams with partial tails") {
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 42L, 55L, 56L, 100L, 101L)) {
      val audio = FlacCodec.decode(FlacCodec.encode(id))
      assert(audio.sampleRate == FlacCodec.rate(id))
      assert(audio.channels == 1)
      assert(audio.mono.toSeq == formulaPcm(id).toSeq,
        s"PCM mismatch id=$id")
      // several frames: nSamples 200-256 over blocksize 64
      assert(FlacCodec.nSamples(id) > FlacCodec.BlockSize)
    }
  }

  test("tampered frames reject: payload byte (CRC-16), header byte " +
      "(CRC-8 or sync), STREAMINFO truncation") {
    val good = FlacCodec.encode(9L)
    // find the first frame start: after fLaC(4) + block header(4) + 34
    val frameStart = 4 + 4 + 34
    val bodyTamper = good.clone()
    bodyTamper(frameStart + 12) = (bodyTamper(frameStart + 12) ^ 0x10).toByte
    intercept[Exception] { FlacCodec.decode(bodyTamper) }
    val headTamper = good.clone()
    headTamper(frameStart + 2) = (headTamper(frameStart + 2) ^ 0x04).toByte
    intercept[Exception] { FlacCodec.decode(headTamper) }
    intercept[Exception] {
      FlacCodec.decode(java.util.Arrays.copyOf(good, 30))
    }
    FlacCodec.decode(good) // control
  }

  test("the STREAMINFO MD5 gate trips on a wrong digest even when " +
      "framing is intact") {
    val good = FlacCodec.encode(4L)
    val bad = good.clone()
    // md5 is the last 16 bytes of STREAMINFO (ends at offset 4+4+34)
    bad(4 + 4 + 34 - 3) = (bad(4 + 4 + 34 - 3) ^ 0x01).toByte
    val ex = intercept[Exception] { FlacCodec.decode(bad) }
    assert(ex.getMessage.contains("MD5"))
  }

  test("the Rice escape hatch round-trips extreme residuals (full-scale " +
      "alternation defeats every predictor)") {
    val n = 192
    val pcm = Array.tabulate(n)(i => if (i % 2 == 0) 32767 else -32768)
    for (lpc <- Seq(false, true)) {
      val audio = FlacCodec.decode(FlacCodec.encodePcm(pcm, 16000, lpc))
      assert(audio.mono.toSeq == pcm.toSeq, s"escape path lpc=$lpc")
    }
  }

  test("hand-built streams: constant and verbatim subframes, 5-bit " +
      "Rice, partition order 1, and wasted bits all decode") {
    import FlacCodec.{BitWriter, crc8, crc16}
    val bs = 16
    def frame(idx: Long)(body: BitWriter => Unit): Array[Byte] = {
      val h = new BitWriter
      h.write(0x3FFE, 14); h.write(0, 1); h.write(0, 1)
      h.write(6, 4)  // 8-bit blocksize-1 at header end
      h.write(0, 4)  // rate from STREAMINFO
      h.write(0, 4)  // mono
      h.write(4, 3)  // 16-bit
      h.write(0, 1)
      h.write(idx, 8) // coded number < 0x80 is the byte itself
      h.write(bs.toLong - 1, 8)
      val head = h.toBytes
      val w = new BitWriter
      head.foreach(x => w.write((x & 0xFF).toLong, 8))
      w.write(crc8(head, 0, head.length).toLong, 8)
      body(w)
      w.alignByte()
      val b = w.toBytes
      val all = new BitWriter
      b.foreach(x => all.write((x & 0xFF).toLong, 8))
      all.write(crc16(b, 0, b.length).toLong, 16)
      all.toBytes
    }
    // expected PCM per frame
    val f0 = Array.fill(bs)(-5)                       // constant
    val f1 = Array.tabulate(bs)(i => i * 3 - 20)      // verbatim
    val f2 = Array.fill(bs)(7)                        // fixed0 + partitions
    val f3 = Array.tabulate(bs)(_ => 6)               // wasted bits (all even)
    val stream = new java.io.ByteArrayOutputStream()
    stream.write("fLaC".getBytes("US-ASCII"))
    val si = new BitWriter
    si.write(1, 1); si.write(0, 7); si.write(34, 24)
    si.write(bs.toLong, 16); si.write(bs.toLong, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(16000, 20); si.write(0, 3); si.write(15, 5)
    si.write(4L * bs, 36)
    (0 until 16).foreach(_ => si.write(0, 8)) // md5 zero: check skipped
    stream.write(si.toBytes)
    stream.write(frame(0) { w =>
      w.write(0, 1); w.write(0, 6); w.write(0, 1) // constant
      w.write((-5L) & 0xFFFF, 16)
    })
    stream.write(frame(1) { w =>
      w.write(0, 1); w.write(1, 6); w.write(0, 1) // verbatim
      f1.foreach(v => w.write(v.toLong & 0xFFFF, 16))
    })
    stream.write(frame(2) { w =>
      w.write(0, 1); w.write(8, 6); w.write(0, 1) // fixed order 0
      w.write(1, 2)  // 5-bit Rice method
      w.write(1, 4)  // partition order 1 -> two partitions of 8
      w.write(3, 5)  // partition 1: k=3
      (0 until 8).foreach(_ => { // zigzag(7)=14 -> q=1, rem=6
        w.writeUnary(1); w.write(6, 3)
      })
      w.write(31, 5) // partition 2: 5-bit escape
      w.write(4, 5)  // raw 4-bit residuals
      (0 until 8).foreach(_ => w.write(7, 4))
    })
    stream.write(frame(3) { w =>
      w.write(0, 1); w.write(8, 6)                // fixed order 0
      w.write(1, 1); w.writeUnary(0)              // wasted bits = 1
      w.write(0, 2); w.write(0, 4)                // 4-bit Rice, 1 partition
      w.write(0, 4)                               // k = 0
      (0 until bs).foreach(_ => { // residual 3 at effBps: zigzag(3)=6
        w.writeUnary(6)
      })
    })
    val audio = FlacCodec.decode(stream.toByteArray)
    assert(audio.mono.toSeq ==
      (f0 ++ f1 ++ f2 ++ f3).toSeq)
  }

  test("independent stereo decodes: two subframes per frame, distinct " +
      "predictors per channel, MD5 over interleaved channels") {
    import FlacCodec.{BitWriter, crc8, crc16}
    val bs = 16
    val left = Array.tabulate(bs)(i => i * 5 - 40)   // verbatim channel
    val right = Array.fill(bs)(123)                   // constant channel
    val stream = new java.io.ByteArrayOutputStream()
    stream.write("fLaC".getBytes("US-ASCII"))
    val si = new BitWriter
    si.write(1, 1); si.write(0, 7); si.write(34, 24)
    si.write(bs.toLong, 16); si.write(bs.toLong, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(22050, 20)
    si.write(1, 3)  // channels - 1 = 1 -> stereo
    si.write(15, 5)
    si.write(bs.toLong, 36)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    (0 until bs).foreach { i =>
      md5.update((left(i) & 0xFF).toByte)
      md5.update(((left(i) >> 8) & 0xFF).toByte)
      md5.update((right(i) & 0xFF).toByte)
      md5.update(((right(i) >> 8) & 0xFF).toByte)
    }
    md5.digest().foreach(b => si.write((b & 0xFF).toLong, 8))
    stream.write(si.toBytes)
    val h = new BitWriter
    h.write(0x3FFE, 14); h.write(0, 1); h.write(0, 1)
    h.write(6, 4); h.write(0, 4)
    h.write(1, 4)  // channel assignment: 2 independent channels
    h.write(4, 3); h.write(0, 1)
    h.write(0, 8)  // frame 0
    h.write(bs.toLong - 1, 8)
    val head = h.toBytes
    val w = new BitWriter
    head.foreach(x => w.write((x & 0xFF).toLong, 8))
    w.write(crc8(head, 0, head.length).toLong, 8)
    w.write(0, 1); w.write(1, 6); w.write(0, 1) // left: verbatim
    left.foreach(v => w.write(v.toLong & 0xFFFF, 16))
    w.write(0, 1); w.write(0, 6); w.write(0, 1) // right: constant
    w.write(123L, 16)
    w.alignByte()
    val body = w.toBytes
    val all = new BitWriter
    body.foreach(x => all.write((x & 0xFF).toLong, 8))
    all.write(crc16(body, 0, body.length).toLong, 16)
    stream.write(all.toBytes)
    val audio = FlacCodec.decode(stream.toByteArray)
    assert(audio.channels == 2)
    assert(audio.samples(0).toSeq == left.toSeq)
    assert(audio.samples(1).toSeq == right.toSeq)
  }

  test("stereo decorrelation modes reconstruct exactly: left/side, " +
      "side/right, mid/side (the libFLAC default for stereo), " +
      "17-bit side channels included") {
    import FlacCodec.{BitWriter, crc8, crc16}
    val bs = 16
    val rnd = new scala.util.Random(5)
    val left = Array.tabulate(bs)(_ => rnd.nextInt(65536) - 32768)
    val right = Array.tabulate(bs)(_ => rnd.nextInt(65536) - 32768)
    for (mode <- Seq(8, 9, 10)) {
      val (c0, c1, w0, w1) = mode match {
        case 8 => // left + side(17)
          (left.map(_.toLong), Array.tabulate(bs)(i =>
            left(i).toLong - right(i)), 16, 17)
        case 9 => // side(17) + right
          (Array.tabulate(bs)(i => left(i).toLong - right(i)),
            right.map(_.toLong), 17, 16)
        case _ => // mid + side(17)
          (Array.tabulate(bs)(i => ((left(i) + right(i)) >> 1).toLong),
            Array.tabulate(bs)(i => left(i).toLong - right(i)), 16, 17)
      }
      val stream = new java.io.ByteArrayOutputStream()
      stream.write("fLaC".getBytes("US-ASCII"))
      val si = new BitWriter
      si.write(1, 1); si.write(0, 7); si.write(34, 24)
      si.write(bs.toLong, 16); si.write(bs.toLong, 16)
      si.write(0, 24); si.write(0, 24)
      si.write(32000, 20); si.write(1, 3); si.write(15, 5)
      si.write(bs.toLong, 36)
      val md5 = java.security.MessageDigest.getInstance("MD5")
      (0 until bs).foreach { i =>
        md5.update((left(i) & 0xFF).toByte)
        md5.update(((left(i) >> 8) & 0xFF).toByte)
        md5.update((right(i) & 0xFF).toByte)
        md5.update(((right(i) >> 8) & 0xFF).toByte)
      }
      md5.digest().foreach(b => si.write((b & 0xFF).toLong, 8))
      stream.write(si.toBytes)
      val h = new BitWriter
      h.write(0x3FFE, 14); h.write(0, 1); h.write(0, 1)
      h.write(6, 4); h.write(0, 4)
      h.write(mode.toLong, 4) // decorrelated stereo
      h.write(4, 3); h.write(0, 1)
      h.write(0, 8)
      h.write(bs.toLong - 1, 8)
      val head = h.toBytes
      val w = new BitWriter
      head.foreach(x => w.write((x & 0xFF).toLong, 8))
      w.write(crc8(head, 0, head.length).toLong, 8)
      w.write(0, 1); w.write(1, 6); w.write(0, 1) // ch0: verbatim
      c0.foreach(v => w.write(v, w0))
      w.write(0, 1); w.write(1, 6); w.write(0, 1) // ch1: verbatim
      c1.foreach(v => w.write(v, w1))
      w.alignByte()
      val body = w.toBytes
      val all = new BitWriter
      body.foreach(x => all.write((x & 0xFF).toLong, 8))
      all.write(crc16(body, 0, body.length).toLong, 16)
      stream.write(all.toBytes)
      val audio = FlacCodec.decode(stream.toByteArray)
      assert(audio.samples(0).toSeq == left.toSeq, s"left mode=$mode")
      assert(audio.samples(1).toSeq == right.toSeq, s"right mode=$mode")
    }
  }

  test("the stereo ENCODER picks mid/side for correlated channels and " +
      "independent for uncorrelated ones, and both round-trip exactly") {
    def modesOf(bytes: Array[Byte]): (Int, Int) = {
      // frame header byte 3 = chanCode<<4 | ssCode<<1: scan for the
      // two possible 4-byte frame prefixes (sync FFF8, bs code 7,
      // rate code 0)
      var indep = 0
      var ms = 0
      var i = 0
      while (i + 3 < bytes.length) {
        if (bytes(i) == 0xFF.toByte && bytes(i + 1) == 0xF8.toByte &&
            bytes(i + 2) == 0x70.toByte) {
          if (bytes(i + 3) == 0x18.toByte) indep += 1
          else if (bytes(i + 3) == 0xA8.toByte) ms += 1
        }
        i += 1
      }
      (indep, ms)
    }
    for (id <- Seq(2L, 3L, 8L, 9L)) {
      val n = FlacCodec.nSamples(id)
      val left = Array.tabulate(n)(i => FlacCodec.sample(id, i))
      val right = Array.tabulate(n)(i => FlacCodec.rightSample(id, i))
      val enc = FlacCodec.encodePcmStereo(left, right, 16000)
      val (indep, ms) = modesOf(enc)
      assert(indep + ms >= 4, s"expected several frames, got $indep+$ms")
      if (id % 2 == 0)
        assert(indep > 0 && ms == 0,
          s"uncorrelated id=$id should stay independent ($indep/$ms)")
      else
        assert(ms > 0,
          s"near-identical channels id=$id should decorrelate ($indep/$ms)")
      val audio = FlacCodec.decode(enc)
      assert(audio.samples(0).toSeq == left.toSeq, s"left id=$id")
      assert(audio.samples(1).toSeq == right.toSeq, s"right id=$id")
    }
  }

  test("fuzzed headers reject or parse, never hang or misdecode " +
      "(seeded random mutations)") {
    val good = FlacCodec.encode(11L)
    val want = formulaPcm(11L).toSeq
    val rnd = new scala.util.Random(77)
    var rejected = 0
    for (_ <- 0 until 300) {
      val mut = good.clone()
      for (_ <- 0 until rnd.nextInt(3) + 1)
        mut(rnd.nextInt(mut.length)) = (rnd.nextInt(256) - 128).toByte
      try {
        val audio = FlacCodec.decode(mut)
        // a surviving parse must still satisfy the MD5 gate -> exact
        assert(audio.mono.toSeq == want)
      } catch { case _: Throwable => rejected += 1 }
    }
    assert(rejected > 250, s"only $rejected/300 rejected")
  }
}
