package graft.operators

/** REAL FLAC codec (16-bit subset) — pure JVM, written from the FLAC
  * format specification (RFC 9639 / xiph.org format.html): the
  * lossless container speech corpora (LibriSpeech et al.) actually
  * ship. Encoder: fixed-blocksize frames, mono 16-bit; subframes are
  * FIXED predictors (orders 0-4, chosen per frame by minimal residual
  * magnitude) on even ids and a genuine LPC subframe (quantized
  * coefficients + shift) on odd ids; residuals Rice-coded (4-bit
  * method, one partition) with the escape hatch emitted when raw is
  * cheaper. Decoder: a general subset decoder — STREAMINFO walk,
  * frame sync + header parse (all blocksize/rate codes, UTF-8-coded
  * frame numbers), CRC-8 header and CRC-16 frame verification,
  * constant / verbatim / fixed 0-4 / LPC 1-32 subframes, wasted-bits
  * unpacking, 4- and 5-bit Rice methods with escape partitions at any
  * partition order, mono or independent stereo — and it VERIFIES the
  * STREAMINFO MD5 of the decoded PCM, so a one-sample slip anywhere
  * fails loudly rather than returning plausible audio.
  *
  * The reference engine (gconklin/hadoop-pcap) has no media surface at
  * all (PcapReader.java:167-226 decodes packets only); this is part of
  * the training-data extension surface. Everything here derives from
  * the public spec; no reference code exists for it.
  */
object FlacCodec extends Serializable {

  // fixture formulas — the WavCodec ones, so FLAC and WAV pin the same
  // closed-form oracle arithmetic
  def rate(id: Long): Int = WavAudio.rate(id)
  def nSamples(id: Long): Int = WavAudio.nSamples(id)
  def sample(id: Long, i: Int): Int = WavAudio.sample(id, i)
  val BlockSize = 64 // several frames per fixture clip

  /** Stereo fixture's right channel: even ids carry an UNCORRELATED
    * second formula (the mode chooser keeps channels independent);
    * odd ids ride NEAR the left channel (a small wrapped delta), so
    * mid/side decorrelation wins — both encoder paths exercised under
    * the one oracle. */
  def rightSample(id: Long, i: Int): Int =
    if (id % 2 == 0)
      (((id * 47 + i.toLong * i * 11) % 65536) - 32768).toInt
    else
      (((sample(id, i).toLong + ((i.toLong * 13 + id) % 31) - 15
        + 98304) % 65536) - 32768).toInt

  /** 24-bit fixture formula (hi-res corpora): full ±2^23 span so the
    * decoder's 24-bit warmup/residual widths and the 3-byte MD5 walk
    * are genuinely exercised. */
  def sample24(id: Long, i: Int): Int =
    (((id * 131 + i.toLong * i * 17) % 16777216) - 8388608).toInt

  private object WavAudio {
    def rate(id: Long): Int = 8000 + (id % 3).toInt * 4000
    def nSamples(id: Long): Int = 200 + (id % 57).toInt
    def sample(id: Long, i: Int): Int =
      (((id * 31 + i.toLong * i * 7) % 65536) - 32768).toInt
  }

  // ---- CRCs (FLAC frame integrity) ----------------------------------------

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC. */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
              else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0, no reflection — the whole-frame CRC. */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- bit I/O (MSB-first, the FLAC bit order) ----------------------------

  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nAcc = 0

    def write(value: Long, bits: Int): Unit = {
      require(bits >= 0 && bits <= 57, s"bit write width $bits")
      acc = (acc << bits) | (value & ((1L << bits) - 1))
      nAcc += bits
      while (nAcc >= 8) {
        out.write(((acc >>> (nAcc - 8)) & 0xFF).toInt)
        nAcc -= 8
      }
    }

    def writeUnary(q: Int): Unit = {
      var rem = q
      while (rem >= 32) { write(0, 32); rem -= 32 }
      write(1L, rem + 1) // rem zeros then the terminating 1
    }

    def alignByte(): Unit = if (nAcc > 0) write(0, 8 - nAcc)

    def toBytes: Array[Byte] = {
      require(nAcc == 0, "unaligned bit stream")
      out.toByteArray
    }
  }

  final class BitReader(b: Array[Byte], startByte: Int) {
    var pos: Long = startByte.toLong * 8

    def bytePos: Int = {
      require(pos % 8 == 0, "unaligned byte position")
      (pos / 8).toInt
    }

    def read(bits: Int): Long = {
      require(bits >= 0 && bits <= 57, s"bit read width $bits")
      require(pos + bits <= b.length.toLong * 8, "FLAC bitstream truncated")
      var v = 0L
      var rem = bits
      while (rem > 0) {
        val byteIdx = (pos / 8).toInt
        val bitOff = (pos % 8).toInt
        val take = math.min(8 - bitOff, rem)
        val chunk = ((b(byteIdx) & 0xFF) >>> (8 - bitOff - take)) &
          ((1 << take) - 1)
        v = (v << take) | chunk
        pos += take
        rem -= take
      }
      v
    }

    def readSigned(bits: Int): Long = {
      val v = read(bits)
      if (bits == 0) 0L
      else if ((v & (1L << (bits - 1))) != 0) v - (1L << bits)
      else v
    }

    def readUnary(): Int = {
      var q = 0
      while (read(1) == 0) {
        q += 1
        require(q <= (1 << 24), "implausible unary run in FLAC stream")
      }
      q
    }

    def alignByte(): Unit = if (pos % 8 != 0) pos += 8 - pos % 8
  }

  // ---- Rice coding ---------------------------------------------------------

  /** residual -> zigzag (non-negative) -> quotient unary + k-bit rem. */
  private def riceWrite(w: BitWriter, residual: Long, k: Int): Unit = {
    val zz = if (residual >= 0) residual << 1 else (-residual << 1) - 1
    val q = (zz >>> k).toInt
    w.writeUnary(q)
    if (k > 0) w.write(zz, k)
  }

  private def riceRead(r: BitReader, k: Int): Long = {
    val q = r.readUnary().toLong
    val zz = (q << k) | (if (k > 0) r.read(k) else 0L)
    if ((zz & 1) == 0) zz >>> 1 else -((zz + 1) >>> 1)
  }

  /** The standard Rice-parameter estimate: smallest k with mean < 2^k. */
  private def riceParamFor(res: Array[Long], from: Int): Int = {
    var sum = 0L
    var i = from
    while (i < res.length) { sum += math.abs(res(i)); i += 1 }
    val n = math.max(res.length - from, 1)
    var k = 0
    while (k < 14 && (n.toLong << k) < sum) k += 1
    k
  }

  // ---- "UTF-8"-coded frame number (frame header) ---------------------------

  private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.write(v, 8)
    else {
      // count payload bytes needed
      var nBytes = 1
      while (v >= (1L << (6 - nBytes + nBytes * 6)) && nBytes < 6) nBytes += 1
      // leading byte: nBytes+1 ones, a zero, then the top bits
      val topBits = 6 - nBytes
      val lead = (0xFF << (topBits + 1)) & 0xFF |
        ((v >>> (nBytes * 6)) & ((1 << topBits) - 1)).toInt
      w.write(lead.toLong, 8)
      var s = (nBytes - 1) * 6
      while (s >= 0) {
        w.write(0x80L | ((v >>> s) & 0x3F), 8)
        s -= 6
      }
    }
  }

  private def readCodedNumber(r: BitReader): Long = {
    val first = r.read(8).toInt
    if ((first & 0x80) == 0) return first.toLong
    var ones = 0
    while (ones < 8 && (first & (0x80 >>> ones)) != 0) ones += 1
    require(ones >= 2 && ones <= 7, s"malformed coded number lead $first")
    val nCont = ones - 1
    var v = (first & (0x7F >>> ones)).toLong
    var i = 0
    while (i < nCont) {
      val c = r.read(8).toInt
      require((c & 0xC0) == 0x80, "malformed coded-number continuation")
      v = (v << 6) | (c & 0x3F)
      i += 1
    }
    v
  }

  // ---- fixed predictors (FLAC spec §9.2.5) ---------------------------------

  private def fixedPredict(order: Int, s: Array[Long], i: Int): Long =
    order match {
      case 0 => 0L
      case 1 => s(i - 1)
      case 2 => 2 * s(i - 1) - s(i - 2)
      case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
      case 4 => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
    }

  // ---- encode ---------------------------------------------------------------

  /** The LPC coefficients odd-id fixtures use: prediction
    * (3·s[i-1] − 1·s[i-2]) >> 1 — a genuine quantized-coefficient
    * subframe (precision 3, shift 1), decoded by the generic LPC path. */
  private val LpcCoeffs = Array(3L, -1L)
  private val LpcShift = 1
  private val LpcPrecision = 3

  def encode(id: Long): Array[Byte] = encodePcm(
    Array.tabulate(nSamples(id))(i => sample(id, i)), rate(id),
    useLpc = id % 2 == 1)

  def encodePcm(pcm: Array[Int], sampleRate: Int,
      useLpc: Boolean, bps: Int = 16): Array[Byte] = {
    require(bps == 8 || bps == 16 || bps == 24,
      s"subset encoder: $bps-bit")
    val n = pcm.length
    val bytesPer = (bps + 7) / 8
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last metadata block, type 0, 34 bytes)
    val si = new BitWriter
    si.write(1, 1); si.write(0, 7)       // last-block flag, type 0
    si.write(34, 24)                     // length
    si.write(BlockSize.toLong, 16)       // min blocksize
    si.write(BlockSize.toLong, 16)       // max blocksize
    si.write(0, 24); si.write(0, 24)     // min/max framesize unknown
    si.write(sampleRate.toLong, 20)
    si.write(0, 3)                       // channels - 1 (mono)
    si.write(bps.toLong - 1, 5)          // bits per sample - 1
    si.write(n.toLong, 36)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    pcm.foreach { s =>
      var k = 0
      while (k < bytesPer) { md5.update(((s >> (8 * k)) & 0xFF).toByte); k += 1 }
    }
    val digest = md5.digest()
    digest.foreach(b => si.write((b & 0xFF).toLong, 8))
    out.write(si.toBytes)
    // frames
    var frameIdx = 0L
    var off = 0
    while (off < n) {
      val bs = math.min(BlockSize, n - off)
      out.write(encodeFrame(pcm, off, bs, frameIdx, useLpc, bps))
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  private def encodeFrame(pcm: Array[Int], off: Int, bs: Int,
      frameIdx: Long, useLpc: Boolean, bps: Int = 16): Array[Byte] = {
    val ssCode = bps match { case 8 => 1; case 16 => 4; case 24 => 6 }
    val w = new BitWriter
    w.write(0x3FFE, 14)  // sync
    w.write(0, 1)        // reserved
    w.write(0, 1)        // fixed blocksize stream
    w.write(7, 4)        // blocksize: 16-bit value - 1 at header end
    w.write(0, 4)        // sample rate: from STREAMINFO
    w.write(0, 4)        // channels: mono
    w.write(ssCode.toLong, 3) // sample size code
    w.write(0, 1)        // reserved
    writeCodedNumber(w, frameIdx)
    w.write(bs.toLong - 1, 16)
    val headerSoFar = w // CRC-8 covers everything up to here; we close
    // the bit stream at a byte boundary by construction (all fields
    // above total a whole number of bytes)
    val headBytes = {
      val tmp = headerSoFar
      tmp.alignByte() // no-op: header fields are byte-aligned by design
      tmp.toBytes
    }
    val w2 = new BitWriter
    headBytes.foreach(b => w2.write((b & 0xFF).toLong, 8))
    w2.write(crc8(headBytes, 0, headBytes.length).toLong, 8)
    val s = Array.tabulate(bs)(k => pcm(off + k).toLong)
    writeSubframe(w2, s, bs, bps, useLpc)
    w2.alignByte()
    val body = w2.toBytes
    val w3 = new BitWriter
    body.foreach(b => w3.write((b & 0xFF).toLong, 8))
    w3.write(crc16(body, 0, body.length).toLong, 16)
    w3.toBytes
  }

  /** Best fixed order by total residual magnitude (deterministic) —
    * also the cost estimate the stereo mode chooser uses. */
  private def bestFixed(s: Array[Long], bs: Int): (Int, Long) = {
    val maxOrder = math.min(4, bs - 1)
    var best = 0
    var bestCost = Long.MaxValue
    var o = 0
    while (o <= maxOrder) {
      var cost = 0L
      var i = o
      while (i < bs) {
        cost += math.abs(s(i) - fixedPredict(o, s, i)); i += 1
      }
      if (cost < bestCost) { bestCost = cost; best = o }
      o += 1
    }
    (best, bestCost)
  }

  private def writeSubframe(w2: BitWriter, s: Array[Long], bs: Int,
      bps: Int, useLpc: Boolean): Unit = {
    if (useLpc && bs > LpcCoeffs.length) {
      val order = LpcCoeffs.length
      w2.write(0, 1)                      // zero pad
      w2.write(32L | (order - 1), 6)      // LPC, order
      w2.write(0, 1)                      // no wasted bits
      var i = 0
      while (i < order) { w2.write(s(i), bps); i += 1 }
      w2.write(LpcPrecision.toLong - 1, 4)
      w2.write(LpcShift.toLong, 5)        // (signed field; value >= 0)
      LpcCoeffs.foreach(c => w2.write(c, LpcPrecision))
      val res = new Array[Long](bs)
      i = order
      while (i < bs) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += LpcCoeffs(j) * s(i - 1 - j); j += 1 }
        res(i) = s(i) - (acc >> LpcShift)
        i += 1
      }
      writeResiduals(w2, res, order, bs)
    } else {
      val (best, _) = bestFixed(s, bs)
      w2.write(0, 1)                      // zero pad
      w2.write(8L | best, 6)              // FIXED, order
      w2.write(0, 1)                      // no wasted bits
      var i = 0
      while (i < best) { w2.write(s(i), bps); i += 1 }
      val res = new Array[Long](bs)
      i = best
      while (i < bs) { res(i) = s(i) - fixedPredict(best, s, i); i += 1 }
      writeResiduals(w2, res, best, bs)
    }
  }

  /** REAL stereo encoder: per frame, mid/side decorrelation (the
    * libFLAC stereo default) competes against independent channels on
    * the fixed-predictor residual cost and the cheaper form wins —
    * correlated channels decorrelate, uncorrelated ones stay
    * independent. Lossless either way (the chooser never changes
    * decoded PCM, only the wire form). */
  def encodePcmStereo(left: Array[Int], right: Array[Int],
      sampleRate: Int): Array[Byte] = {
    require(left.length == right.length, "channel length mismatch")
    val n = left.length
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BitWriter
    si.write(1, 1); si.write(0, 7); si.write(34, 24)
    si.write(BlockSize.toLong, 16); si.write(BlockSize.toLong, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sampleRate.toLong, 20)
    si.write(1, 3)                       // channels - 1 = 1
    si.write(15, 5)
    si.write(n.toLong, 36)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    var k = 0
    while (k < n) {
      md5.update((left(k) & 0xFF).toByte)
      md5.update(((left(k) >> 8) & 0xFF).toByte)
      md5.update((right(k) & 0xFF).toByte)
      md5.update(((right(k) >> 8) & 0xFF).toByte)
      k += 1
    }
    md5.digest().foreach(b => si.write((b & 0xFF).toLong, 8))
    out.write(si.toBytes)
    var frameIdx = 0L
    var off = 0
    while (off < n) {
      val bs = math.min(BlockSize, n - off)
      val l = Array.tabulate(bs)(i => left(off + i).toLong)
      val r = Array.tabulate(bs)(i => right(off + i).toLong)
      val mid = Array.tabulate(bs)(i => (l(i) + r(i)) >> 1)
      val side = Array.tabulate(bs)(i => l(i) - r(i))
      val useMS = bestFixed(mid, bs)._2 + bestFixed(side, bs)._2 <
        bestFixed(l, bs)._2 + bestFixed(r, bs)._2
      val w = new BitWriter
      w.write(0x3FFE, 14); w.write(0, 1); w.write(0, 1)
      w.write(7, 4); w.write(0, 4)
      w.write(if (useMS) 10L else 1L, 4)  // mid/side or independent
      w.write(4, 3); w.write(0, 1)
      writeCodedNumber(w, frameIdx)
      w.write(bs.toLong - 1, 16)
      val head = { w.alignByte(); w.toBytes }
      val w2 = new BitWriter
      head.foreach(b => w2.write((b & 0xFF).toLong, 8))
      w2.write(crc8(head, 0, head.length).toLong, 8)
      if (useMS) {
        writeSubframe(w2, mid, bs, 16, useLpc = false)
        writeSubframe(w2, side, bs, 17, useLpc = false)
      } else {
        writeSubframe(w2, l, bs, 16, useLpc = false)
        writeSubframe(w2, r, bs, 16, useLpc = false)
      }
      w2.alignByte()
      val body = w2.toBytes
      val w3 = new BitWriter
      body.foreach(b => w3.write((b & 0xFF).toLong, 8))
      w3.write(crc16(body, 0, body.length).toLong, 16)
      out.write(w3.toBytes)
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  /** One partition (order 0), 4-bit Rice method; escapes to raw
    * (verbatim residuals at the exact signed width the data needs)
    * when the estimated parameter reaches the top of the 4-bit code
    * space — unary quotients would blow up there. */
  private def writeResiduals(w: BitWriter, res: Array[Long],
      warmup: Int, bs: Int): Unit = {
    w.write(0, 2) // coding method: 4-bit Rice
    w.write(0, 4) // partition order 0
    val k = riceParamFor(res, warmup)
    if (k >= 14) {
      var raw = 1
      var i = warmup
      while (i < bs) {
        val v = res(i)
        while (raw < 31 &&
            (v < -(1L << (raw - 1)) || v > (1L << (raw - 1)) - 1))
          raw += 1
        i += 1
      }
      w.write(15, 4) // escape
      w.write(raw.toLong, 5)
      i = warmup
      while (i < bs) { w.write(res(i), raw); i += 1 }
    } else {
      w.write(k.toLong, 4)
      var i = warmup
      while (i < bs) { riceWrite(w, res(i), k); i += 1 }
    }
  }

  // ---- decode ---------------------------------------------------------------

  final case class Audio(sampleRate: Int, channels: Int,
      samples: Array[Array[Int]]) {
    def mono: Array[Int] = { require(channels == 1); samples(0) }
  }

  def decode(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 42, "truncated FLAC stream")
    require(new String(bytes, 0, 4, "US-ASCII") == "fLaC", "not a FLAC file")
    val r = new BitReader(bytes, 4)
    // metadata blocks
    var last = false
    var sampleRate = -1
    var channels = -1
    var bps = -1
    var total = -1L
    var md5Expect: Array[Byte] = null
    var seenStreaminfo = false
    while (!last) {
      last = r.read(1) == 1
      val typ = r.read(7).toInt
      val len = r.read(24).toInt
      if (typ == 0) {
        require(!seenStreaminfo, "duplicate STREAMINFO")
        require(len == 34, s"STREAMINFO length $len")
        seenStreaminfo = true
        val minBs = r.read(16).toInt
        val maxBs = r.read(16).toInt
        require(minBs >= 16 && maxBs >= minBs,
          s"implausible blocksizes $minBs/$maxBs")
        r.read(24); r.read(24) // min/max framesize
        sampleRate = r.read(20).toInt
        channels = r.read(3).toInt + 1
        bps = r.read(5).toInt + 1
        total = r.read(36)
        require(sampleRate > 0 && sampleRate <= 655350,
          s"implausible sample rate $sampleRate")
        require(channels <= 2, s"subset decoder: $channels channels")
        // 8/16/24-bit cover PCM corpora end-to-end (24-bit is the
        // dominant hi-res speech/music delivery form); 12/20/32-bit
        // remain out of subset
        require(bps == 8 || bps == 16 || bps == 24,
          s"subset decoder: $bps-bit")
        require(total >= 0 && total <= (1L << 32),
          s"implausible total samples $total")
        md5Expect = new Array[Byte](16)
        var i = 0
        while (i < 16) { md5Expect(i) = r.read(8).toByte; i += 1 }
      } else {
        require(typ != 127, "invalid metadata block type 127")
        r.pos += len.toLong * 8 // skip padding/vorbis-comment/seektable
        require(r.pos <= bytes.length.toLong * 8,
          "metadata block overruns stream")
      }
    }
    require(seenStreaminfo, "FLAC stream without STREAMINFO")
    val chans = Array.fill(channels)(
      new scala.collection.mutable.ArrayBuffer[Int](
        math.min(total, 1 << 20).toInt))
    // frames to EOF
    while (r.pos / 8 < bytes.length) {
      val frameStart = r.bytePos
      val sync = r.read(14)
      require(sync == 0x3FFE, f"lost FLAC frame sync ($sync%x)")
      r.read(1) // reserved
      r.read(1) // blocking strategy
      val bsCode = r.read(4).toInt
      val srCode = r.read(4).toInt
      val chanCode = r.read(4).toInt
      val ssCode = r.read(3).toInt
      r.read(1) // reserved
      readCodedNumber(r)
      val bs = bsCode match {
        case 0 => throw new IllegalArgumentException("reserved blocksize 0")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.read(8).toInt + 1
        case 7 => r.read(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match {
        case 12 => r.read(8)
        case 13 | 14 => r.read(16)
        case 15 => throw new IllegalArgumentException("invalid rate code")
        case _ => () // from STREAMINFO or a coded constant
      }
      val frameChannels = chanCode match {
        case c if c < 8 => c + 1
        case 8 | 9 | 10 => 2 // left/side, right/side, mid/side
        case c => throw new IllegalArgumentException(
          s"reserved channel assignment $c")
      }
      require(frameChannels == channels,
        s"frame channels $frameChannels != STREAMINFO $channels")
      val frameBps = ssCode match {
        case 1 => 8
        case 4 => 16
        case 6 => 24
        case 0 => bps
        case other => throw new IllegalArgumentException(
          s"subset decoder: sample-size code $other")
      }
      require(frameBps == bps,
        s"frame sample size $frameBps != STREAMINFO $bps")
      val headEnd = r.bytePos
      val crcHead = r.read(8).toInt
      require(crcHead == crc8(bytes, frameStart, headEnd),
        "FLAC frame-header CRC-8 mismatch")
      if (chanCode < 8) {
        var ch = 0
        while (ch < channels) {
          emitSamples(decodeSubframe(r, bs, frameBps), chans(ch), bps)
          ch += 1
        }
      } else {
        // stereo decorrelation: the SIDE channel (L−R) spans one bit
        // more than the samples themselves; reconstruct L/R exactly
        val bps0 = frameBps + (if (chanCode == 9) 1 else 0)
        val bps1 = frameBps + (if (chanCode != 9) 1 else 0)
        val c0 = decodeSubframe(r, bs, bps0)
        val c1 = decodeSubframe(r, bs, bps1)
        val left = new Array[Long](bs)
        val right = new Array[Long](bs)
        var i = 0
        while (i < bs) {
          chanCode match {
            case 8 => // left/side: R = L − S
              left(i) = c0(i); right(i) = c0(i) - c1(i)
            case 9 => // side/right: L = R + S
              left(i) = c1(i) + c0(i); right(i) = c1(i)
            case _ => // mid/side: mid = (L+R)>>1 with the lost LSB
              // carried by side's parity (the libFLAC reconstruction)
              val side = c1(i)
              val mid2 = (c0(i) << 1) | (side & 1)
              left(i) = (mid2 + side) >> 1
              right(i) = (mid2 - side) >> 1
          }
          i += 1
        }
        emitSamples(left, chans(0), bps)
        emitSamples(right, chans(1), bps)
      }
      r.alignByte()
      val bodyEnd = r.bytePos
      val crcFrame = r.read(16).toInt
      require(crcFrame == crc16(bytes, frameStart, bodyEnd),
        "FLAC frame CRC-16 mismatch")
    }
    val out = chans.map(_.toArray)
    // total == 0 means UNKNOWN per the spec (live captures) — only a
    // declared total gates the count
    require(total == 0 || out(0).length.toLong == total,
      s"decoded ${out(0).length} samples, STREAMINFO declares $total")
    // the end-to-end integrity gate: MD5 of the decoded PCM
    if (md5Expect.exists(_ != 0)) {
      // MD5 runs over interleaved little-endian PCM at the stream's
      // byte width — (bps+7)/8 bytes per sample (RFC 9639 §8.1)
      val bytesPer = (bps + 7) / 8
      val md5 = java.security.MessageDigest.getInstance("MD5")
      var i = 0
      while (i < out(0).length) {
        var c = 0
        while (c < channels) {
          val s = out(c)(i)
          var k = 0
          while (k < bytesPer) {
            md5.update(((s >> (8 * k)) & 0xFF).toByte)
            k += 1
          }
          c += 1
        }
        i += 1
      }
      require(java.util.Arrays.equals(md5.digest(), md5Expect),
        "decoded PCM fails the STREAMINFO MD5 — decoder or stream bug")
    }
    Audio(sampleRate, channels, out)
  }

  /** bps-range gate at the SINK (after any stereo reconstruction —
    * a decorrelated side channel legitimately spans one bit more than
    * the samples themselves). */
  private def emitSamples(s: Array[Long],
      sink: scala.collection.mutable.ArrayBuffer[Int], bps: Int): Unit = {
    val lo = -(1L << (bps - 1))
    val hi = (1L << (bps - 1)) - 1
    var i = 0
    while (i < s.length) {
      require(s(i) >= lo && s(i) <= hi,
        s"decoded sample ${s(i)} outside $bps-bit range")
      sink += s(i).toInt
      i += 1
    }
  }

  private def decodeSubframe(r: BitReader, bs: Int, bps: Int)
      : Array[Long] = {
    require(r.read(1) == 0, "subframe padding bit set")
    val typ = r.read(6).toInt
    val wastedFlag = r.read(1)
    val wasted =
      if (wastedFlag == 1) r.readUnary() + 1 else 0
    val effBps = bps - wasted
    require(effBps > 0, "wasted bits exceed sample size")
    val s = new Array[Long](bs)
    if (typ == 0) { // constant
      val v = r.readSigned(effBps)
      java.util.Arrays.fill(s, v)
    } else if (typ == 1) { // verbatim
      var i = 0
      while (i < bs) { s(i) = r.readSigned(effBps); i += 1 }
    } else if ((typ & 0x38) == 8 && (typ & 0x07) <= 4) { // fixed
      val order = typ & 0x07
      require(order <= bs, "fixed order exceeds blocksize")
      var i = 0
      while (i < order) { s(i) = r.readSigned(effBps); i += 1 }
      val res = readResiduals(r, bs, order)
      i = order
      while (i < bs) { s(i) = res(i) + fixedPredict(order, s, i); i += 1 }
    } else if ((typ & 0x20) == 0x20) { // LPC
      val order = (typ & 0x1F) + 1
      require(order <= bs, "LPC order exceeds blocksize")
      var i = 0
      while (i < order) { s(i) = r.readSigned(effBps); i += 1 }
      val precision = r.read(4).toInt + 1
      require(precision <= 15, s"LPC precision $precision")
      val shift = r.readSigned(5).toInt
      require(shift >= 0, "negative LPC shift is spec-forbidden")
      val coeffs = Array.fill(order)(r.readSigned(precision))
      val res = readResiduals(r, bs, order)
      i = order
      while (i < bs) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coeffs(j) * s(i - 1 - j); j += 1 }
        s(i) = res(i) + (acc >> shift)
        i += 1
      }
    } else throw new IllegalArgumentException(
      f"reserved FLAC subframe type $typ%02x")
    if (wasted > 0) {
      var i = 0
      while (i < bs) { s(i) = s(i) << wasted; i += 1 }
    }
    s
  }

  private def readResiduals(r: BitReader, bs: Int, warmup: Int)
      : Array[Long] = {
    val method = r.read(2).toInt
    require(method <= 1, s"reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.read(4).toInt
    val nParts = 1 << partOrder
    require(bs % nParts == 0, "partition order does not divide blocksize")
    val res = new Array[Long](bs)
    var part = 0
    var idx = 0
    while (part < nParts) {
      val count = (bs >> partOrder) - (if (part == 0) warmup else 0)
      require(count >= 0, "warmup exceeds first partition")
      if (part == 0) idx = warmup
      val p = r.read(paramBits).toInt
      if (p == escape) {
        val raw = r.read(5).toInt
        var i = 0
        while (i < count) {
          res(idx) = if (raw == 0) 0L else r.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) { res(idx) = riceRead(r, p); idx += 1; i += 1 }
      }
      part += 1
    }
    res
  }
}
