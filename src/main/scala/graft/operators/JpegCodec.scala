package graft.operators

/** REAL baseline JPEG/JFIF codec — pure JVM, written from ITU-T T.81
  * (the public JPEG spec): DQT/DHT/SOF0/SOS marker parsing, canonical
  * Huffman entropy coding with the Annex K example tables, DC
  * prediction, zigzag run-length AC coding with ZRL/EOB, byte
  * stuffing, dequantization, a double-precision 2-D IDCT, 4:2:0 chroma
  * upsampling, and JFIF YCbCr→RGB conversion. The decoder is a general
  * baseline-sequential decoder (grayscale or 3-component, sampling
  * factors 1..4, restart markers, multi-table DQT/DHT segments) — it
  * decodes foreign JPEGs such as `javax.imageio`'s writer output, which
  * MultimodalCodecSpec cross-checks in both directions.
  *
  * Exactness design (what makes a LOSSY codec oracle-checkable): the
  * fixture is synthesized in COEFFICIENT space, not pixel space. Each
  * luma block carries a DC level plus three AC basis coefficients whose
  * IDCT is exactly ±1/8 of the dequantized value at every pixel
  * (u,v ∈ {0,4}: cos((2t+1)·4π/16) = ±√2/2, and the √2 factors cancel
  * against C(u)C(v)/4), and each chroma block is DC-only and constant
  * per MCU, so 4:2:0 downsampling/upsampling is exact. With all quant
  * entries = 8 the dequantized DC is 8·(v−128) and the IDCT emits exact
  * integers (fp error ~1e-13 ≪ the 0.5 rounding margin). The ONE
  * remaining non-integer step — YCbCr→RGB — is the closed-form JFIF
  * formula floor(y + 1.402·(cr−128) + 0.5) etc., which the DuckDB
  * oracle replays in identical IEEE-double arithmetic. So the oracle
  * pins every output pixel bit-exactly while the bitstream still
  * exercises real Huffman runs (zero-runs of 3/9/23 → ZRL), DC
  * differentials across blocks, zigzag order, and a full IDCT.
  *
  * The reference engine (gconklin/hadoop-pcap) has no media surface at
  * all; this is extension surface for the multimodal family
  * ([[Multimodal]]), reached through the same magic-byte sniffer as
  * the other five codecs.
  */
object JpegCodec extends Serializable {

  // ---------------------------------------------------------------- fixture

  /** Fixture dims: 21..34 × 13..23 — partial MCUs on both axes for
    * almost every id (MCU is 16×16 at 4:2:0), odd and even. */
  def dims(id: Long): (Int, Int) =
    ((21 + id % 14).toInt, (13 + id % 11).toInt)

  /** Per-luma-block (8×8) synthesis formulas: DC level and the three
    * AC amplitudes (horizontal / vertical / checker basis). */
  def yBase(id: Long, bx: Int, by: Int): Int =
    (64 + (id * 7 + bx * 31 + by * 17) % 128).toInt
  def acA(id: Long, bx: Int, by: Int): Int =
    ((id + bx * 5 + by * 3) % 8).toInt
  def acB(id: Long, bx: Int, by: Int): Int =
    ((id * 3 + bx + by * 7) % 8).toInt
  def acC(id: Long, bx: Int, by: Int): Int =
    ((id * 5 + bx * 7 + by) % 4).toInt

  /** Per-MCU (16×16) chroma synthesis formulas — constant within the
    * MCU so subsampling is exact. */
  def cbOf(id: Long, mx: Int, my: Int): Int =
    ((id * 11 + mx * 13 + my * 19) % 256).toInt
  def crOf(id: Long, mx: Int, my: Int): Int =
    ((id * 3 + mx * 7 + my * 29) % 256).toInt

  /** Sign of cos((2t+1)·4π/16): + for t ∈ {0,3,4,7}, − otherwise. */
  def sgn(t: Int): Int =
    if (t == 0 || t == 3 || t == 4 || t == 7) 1 else -1

  /** The exact decoded luma sample at (x,y) — what the IDCT of the
    * synthesized coefficients reconstructs (range 47..208, no clamp). */
  def lumaAt(id: Long, x: Int, y: Int): Int = {
    val bx = x / 8; val by = y / 8
    yBase(id, bx, by) +
      acA(id, bx, by) * sgn(x % 8) +
      acB(id, bx, by) * sgn(y % 8) +
      acC(id, bx, by) * sgn(x % 8) * sgn(y % 8)
  }

  /** The exact decoded RGB at (x,y): JFIF inverse transform of the
    * exactly-reconstructed (Y, Cb, Cr) — the same double arithmetic
    * the decoder and the DuckDB oracle perform. */
  def expectedRgb(id: Long, x: Int, y: Int): (Int, Int, Int) = {
    val yv = lumaAt(id, x, y)
    val cb = cbOf(id, x / 16, y / 16)
    val cr = crOf(id, x / 16, y / 16)
    (ycc2r(yv, cr), ycc2g(yv, cb, cr), ycc2b(yv, cb))
  }

  // JFIF inverse color transform — floor(v + 0.5) with clamp, written
  // once and shared by decode() so the oracle formula IS the code path.
  private def clamp255(v: Double): Int = {
    val i = math.floor(v).toInt
    if (i < 0) 0 else if (i > 255) 255 else i
  }
  private def ycc2r(y: Int, cr: Int): Int =
    clamp255(y + 1.402 * (cr - 128) + 0.5)
  private def ycc2g(y: Int, cb: Int, cr: Int): Int =
    clamp255(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)
  private def ycc2b(y: Int, cb: Int): Int =
    clamp255(y + 1.772 * (cb - 128) + 0.5)

  // ------------------------------------------------------------ tables

  /** Zigzag scan order: position k in the scan → natural index v*8+u
    * (T.81 Figure 5). */
  private[operators] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // T.81 Annex K example Huffman tables (the de-facto standard set):
  // BITS[1..16] code-length counts + HUFFVAL symbol lists.
  private val DcLumBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcChrBits =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  private val AcLumBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChrBits =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman table built from (BITS, HUFFVAL) — serves both
    * directions: symbol → (code, length) for the encoder, and the T.81
    * F.2.2.3 DECODE procedure (mincode/maxcode/valptr) for the
    * decoder. */
  private[operators] final class Huff(
      bits: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        minCode(l) = code
        valPtr(l) = k
        var i = 0
        while (i < bits(l - 1)) {
          codeOf(vals(k)) = code
          lenOf(vals(k)) = l
          code += 1
          k += 1
          i += 1
        }
        if (bits(l - 1) > 0) maxCode(l) = code - 1
        // Canonical code-space check (T.81 C.2): after assigning the
        // length-l codes the next free code must still fit in l bits,
        // otherwise the (BITS, HUFFVAL) pair over-subscribes the code
        // space and DECODE's valPtr arithmetic indexes out of bounds.
        require(code <= (1 << l), "corrupt Huffman table: code space overflow")
        code <<= 1
        l += 1
      }
      require(k == vals.length, "Huffman BITS/HUFFVAL mismatch")
    }
  }
  private val HuffDcLum = new Huff(DcLumBits, DcVals)
  private val HuffDcChr = new Huff(DcChrBits, DcVals)
  private val HuffAcLum = new Huff(AcLumBits, AcLumVals)
  private val HuffAcChr = new Huff(AcChrBits, AcChrVals)

  // -------------------------------------------------------------- encoder

  /** MSB-first entropy bit writer with 0xFF→0xFF00 byte stuffing and
    * 1-padding on flush (T.81 F.1.2.3). */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit =
      if (n > 0) {
        acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
        out.write(acc)
        if (acc == 0xFF) out.write(0x00)
        acc = 0; n = 0
      }
  }

  /** Bit-size category of a DC diff / AC value (T.81 F.1.2.1.2). */
  private def catOf(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))
  /** Value bits: negatives are stored as v + 2^sz − 1 (one's-
    * complement trick). */
  private def bitsOf(v: Int, sz: Int): Int =
    if (v >= 0) v else v + (1 << sz) - 1

  /** Encode one quantized block (NATURAL coefficient order): DC diff +
    * zigzag AC run-lengths with ZRL and EOB. Returns the block's DC for
    * the caller's prediction chain. */
  private def encodeBlock(bw: BitWriter, coef: Array[Int], pred: Int,
      dc: Huff, ac: Huff): Int = {
    val diff = coef(0) - pred
    val sz = catOf(diff)
    bw.put(dc.codeOf(sz), dc.lenOf(sz))
    if (sz > 0) bw.put(bitsOf(diff, sz), sz)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coef(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) { bw.put(ac.codeOf(0xF0), ac.lenOf(0xF0)); run -= 16 }
        val s = catOf(v)
        bw.put(ac.codeOf((run << 4) | s), ac.lenOf((run << 4) | s))
        bw.put(bitsOf(v, s), s)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(ac.codeOf(0x00), ac.lenOf(0x00)) // EOB
    coef(0)
  }

  /** Write a genuine baseline JFIF file for the fixture id: SOI, APP0,
    * DQT (two all-8 tables), SOF0 (3 components, 4:2:0), DHT (the four
    * Annex K tables), SOS, interleaved entropy-coded MCUs, EOI.
    * `restartInterval > 0` additionally writes a DRI segment and
    * byte-aligned RSTn markers every that-many MCUs with DC-predictor
    * resets — the framing camera JPEGs use for error resilience
    * (exercises the decoder's syncRestart path; the fixture queries
    * use 0). */
  def encode(id: Long, restartInterval: Int = 0,
      dimsOverride: (Int, Int) = null): Array[Byte] = {
    val (w, h) = if (dimsOverride != null) dimsOverride else dims(id)
    val out = new java.io.ByteArrayOutputStream(4096)
    def marker(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def seg(mk: Int, payload: Array[Byte]): Unit = {
      marker(mk)
      val len = payload.length + 2
      out.write(len >>> 8); out.write(len & 0xFF)
      out.write(payload, 0, payload.length)
    }
    marker(0xD8) // SOI
    seg(0xE0, "JFIF\u0000".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0 (luma) + table 1 (chroma), all entries 8, Pq=0;
    // entries are written in zigzag order per spec (uniform, so the
    // order is unobservable here — the decoder still dezigzags).
    val dqt = new Array[Byte](130)
    dqt(0) = 0
    java.util.Arrays.fill(dqt, 1, 65, 8.toByte)
    dqt(65) = 1
    java.util.Arrays.fill(dqt, 66, 130, 8.toByte)
    seg(0xDB, dqt)
    seg(0xC0, Array[Byte](8, (h >>> 8).toByte, h.toByte,
      (w >>> 8).toByte, w.toByte, 3,
      1, 0x22, 0, // Y: 2x2 sampling, qtable 0
      2, 0x11, 1, // Cb
      3, 0x11, 1)) // Cr
    def dht(cls: Int, tid: Int, bits: Array[Int], vals: Array[Int]) =
      Array(((cls << 4) | tid).toByte) ++
        bits.map(_.toByte) ++ vals.map(_.toByte)
    seg(0xC4, dht(0, 0, DcLumBits, DcVals) ++
      dht(1, 0, AcLumBits, AcLumVals) ++
      dht(0, 1, DcChrBits, DcVals) ++
      dht(1, 1, AcChrBits, AcChrVals))
    if (restartInterval > 0)
      seg(0xDD, Array[Byte]((restartInterval >>> 8).toByte,
        restartInterval.toByte))
    seg(0xDA, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val bw = new BitWriter(out)
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    var predY = 0; var predCb = 0; var predCr = 0
    var mcu = 0
    var rstN = 0
    val coef = new Array[Int](64)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush() // pad to byte boundary with 1s
          marker(0xD0 + rstN)
          rstN = (rstN + 1) & 7
          predY = 0; predCb = 0; predCr = 0
        }
        var v = 0
        while (v < 2) {
          var u = 0
          while (u < 2) {
            val bx = 2 * mx + u; val by = 2 * my + v
            java.util.Arrays.fill(coef, 0)
            coef(0) = yBase(id, bx, by) - 128 // quant 8: dequant = 8·DC
            coef(4) = acA(id, bx, by)  // (u=4,v=0): ±a at every pixel
            coef(32) = acB(id, bx, by) // (u=0,v=4): ±b
            coef(36) = acC(id, bx, by) // (u=4,v=4): ±c
            predY = encodeBlock(bw, coef, predY, HuffDcLum, HuffAcLum)
            u += 1
          }
          v += 1
        }
        java.util.Arrays.fill(coef, 0)
        coef(0) = cbOf(id, mx, my) - 128
        predCb = encodeBlock(bw, coef, predCb, HuffDcChr, HuffAcChr)
        java.util.Arrays.fill(coef, 0)
        coef(0) = crOf(id, mx, my) - 128
        predCr = encodeBlock(bw, coef, predCr, HuffDcChr, HuffAcChr)
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // Progressive scans need EOBn symbols ((r<<4)|0 for r=1..14), which
  // the SEQUENTIAL Annex K tables deliberately lack — so the
  // progressive fixture carries its own flat tables: every symbol at
  // code length 8 (canonical, underfull code space — legal, and it
  // also exercises the decoder against non-Annex-K DHT content).
  private def flatHuff(symbols: Array[Int]): (Array[Int], Array[Int]) = {
    val bits = new Array[Int](16)
    bits(7) = symbols.length // all codes 8 bits long
    (bits, symbols)
  }
  private val (progDcBits, progDcVals) = flatHuff((0 to 11).toArray)
  private val (progAcBits, progAcVals) = flatHuff(
    (for { r <- 0 to 15; s <- 0 to 10 } yield (r << 4) | s).toArray)
  private val ProgDcHuff = new Huff(progDcBits, progDcVals)
  private val ProgAcHuff = new Huff(progAcBits, progAcVals)

  /** Write the SAME fixture content as [[encode]] but as a PROGRESSIVE
    * (SOF2) stream — T.81 Annex G: an interleaved DC first scan at
    * Al=1, spectral-band AC first scans for luma split so each band
    * holds one of the fixture's AC positions (zigzag 10 / 14+39),
    * all-zero chroma AC scans (pure EOB runs spanning every block), an
    * AC refinement scan (newly-significant coefficients + correction
    * bits + EOB-run folding), and a DC refinement scan. Because the
    * scans carry the exact same quantized coefficients, the decoded
    * pixels are bit-identical to the baseline stream's — the
    * coefficient-space oracle pins the progressive path too.
    * `restartInterval > 0` adds DRI + RSTn framing inside every scan
    * (predictor/EOB-run resets at each interval). */
  def encodeProgressive(id: Long, restartInterval: Int = 0,
      dimsOverride: (Int, Int) = null): Array[Byte] = {
    val (w, h) = if (dimsOverride != null) dimsOverride else dims(id)
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    // quantized coefficient blocks, natural order — identical content
    // to encode()'s per-block synthesis
    val lumW = 2 * mcusX
    def yBlock(bx: Int, by: Int): Array[Int] = {
      val b = new Array[Int](64)
      b(0) = yBase(id, bx, by) - 128
      b(4) = acA(id, bx, by)
      b(32) = acB(id, bx, by)
      b(36) = acC(id, bx, by)
      b
    }
    val yCoef = Array.tabulate(lumW * 2 * mcusY)(i =>
      yBlock(i % lumW, i / lumW))
    val cbCoef = Array.tabulate(mcusX * mcusY) { i =>
      val b = new Array[Int](64); b(0) = cbOf(id, i % mcusX, i / mcusX); b
    }
    val crCoef = Array.tabulate(mcusX * mcusY) { i =>
      val b = new Array[Int](64); b(0) = crOf(id, i % mcusX, i / mcusX); b
    }
    // the fixture's chroma DC formulas are 0..255 but coefficients are
    // level-shifted like encode()'s
    cbCoef.foreach(b => b(0) -= 128)
    crCoef.foreach(b => b(0) -= 128)

    progressiveBytes(w, h, Array.fill(64)(8), Array.fill(64)(8),
      (bx, by) => yCoef(by * lumW + bx),
      (bx, by) => cbCoef(by * mcusX + bx),
      (bx, by) => crCoef(by * mcusX + bx),
      restartInterval)
  }

  /** Write a complete progressive (SOF2) JFIF stream for arbitrary
    * quantized coefficient blocks — the shared writer behind the
    * fixture encoder ([[encodeProgressive]]) and the general-pixel
    * encoder ([[encodePixelsProgressive]]). `yAt`/`cbAt`/`crAt` return
    * the NATURAL-order quantized block at luma/chroma block
    * coordinates; quant tables are natural-order, written to the DQT
    * in zigzag per spec. Scan script: interleaved DC first pass at
    * Al=1, luma AC bands 1..13 and 14..63 at Al=1, chroma AC full-band
    * at Al=0, a luma AC refinement pass, an interleaved DC refinement
    * pass — entropy-coded with the flat tables (the sequential Annex K
    * set has no EOBn symbols). */
  private def progressiveBytes(w: Int, h: Int,
      qLum: Array[Int], qChr: Array[Int],
      yAt: (Int, Int) => Array[Int],
      cbAt: (Int, Int) => Array[Int],
      crAt: (Int, Int) => Array[Int],
      restartInterval: Int): Array[Byte] = {
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    val out = new java.io.ByteArrayOutputStream(4096)
    def marker(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def seg(mk: Int, payload: Array[Byte]): Unit = {
      marker(mk)
      val len = payload.length + 2
      out.write(len >>> 8); out.write(len & 0xFF)
      out.write(payload, 0, payload.length)
    }
    marker(0xD8)
    seg(0xE0, "JFIF\u0000".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0))
    val dqt = new Array[Byte](130)
    dqt(0) = 0
    var zk = 0
    while (zk < 64) { dqt(1 + zk) = qLum(Zigzag(zk)).toByte; zk += 1 }
    dqt(65) = 1
    zk = 0
    while (zk < 64) { dqt(66 + zk) = qChr(Zigzag(zk)).toByte; zk += 1 }
    seg(0xDB, dqt)
    seg(0xC2, Array[Byte](8, (h >>> 8).toByte, h.toByte, // SOF2
      (w >>> 8).toByte, w.toByte, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    def dht(cls: Int, tid: Int, bits: Array[Int], vals: Array[Int]) =
      Array(((cls << 4) | tid).toByte) ++
        bits.map(_.toByte) ++ vals.map(_.toByte)
    seg(0xC4, dht(0, 0, progDcBits, progDcVals) ++
      dht(1, 0, progAcBits, progAcVals))
    if (restartInterval > 0)
      seg(0xDD, Array[Byte]((restartInterval >>> 8).toByte,
        restartInterval.toByte))

    // every scan selects DHT pair 0/0 (the shared flat tables)
    def sosHeader(comps: Seq[Int], ss: Int, se: Int, ah: Int,
        al: Int): Unit = {
      val ids = Array(1, 2, 3)
      seg(0xDA, Array[Byte](comps.length.toByte) ++
        comps.flatMap(c => Seq(ids(c).toByte, 0x00.toByte)) ++
        Array[Byte](ss.toByte, se.toByte, ((ah << 4) | al).toByte))
    }

    var rstN = 0
    def restart(bw: BitWriter, before: () => Unit): Unit = {
      before()
      bw.flush()
      marker(0xD0 + rstN)
      rstN = (rstN + 1) & 7
    }

    // ---- scan 1: interleaved DC first pass, Al=1 --------------------
    sosHeader(Seq(0, 1, 2), 0, 0, 0, 1)
    locally {
      val bw = new BitWriter(out)
      rstN = 0
      val predv = new Array[Int](3)
      var mcu = 0
      def putDc(c: Int, dcv: Int, t: Huff): Unit = {
        val v = dcv >> 1 // Al=1 point transform (arithmetic shift)
        val diff = v - predv(c)
        predv(c) = v
        val sz = catOf(diff)
        bw.put(t.codeOf(sz), t.lenOf(sz))
        if (sz > 0) bw.put(bitsOf(diff, sz), sz)
      }
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 &&
            mcu % restartInterval == 0) {
            restart(bw, () => ())
            java.util.Arrays.fill(predv, 0)
          }
          var v = 0
          while (v < 2) {
            var u = 0
            while (u < 2) {
              putDc(0, yAt(2 * mx + u, 2 * my + v)(0), ProgDcHuff)
              u += 1
            }
            v += 1
          }
          putDc(1, cbAt(mx, my)(0), ProgDcHuff)
          putDc(2, crAt(mx, my)(0), ProgDcHuff)
          mcu += 1
          mx += 1
        }
        my += 1
      }
      bw.flush()
    }

    // non-interleaved grids (4:2:0): luma ceil(w/8)×ceil(h/8), chroma
    // ceil(ceil(w/2)/8)×ceil(ceil(h/2)/8)
    val yNbW = (w + 7) / 8; val yNbH = (h + 7) / 8
    val cNbW = ((w + 1) / 2 + 7) / 8; val cNbH = ((h + 1) / 2 + 7) / 8

    /** AC first pass over one component's ceil grid (G.1.2.2). */
    def acFirstScan(comp: Int, blocks: (Int, Int) => Array[Int],
        nw: Int, nh: Int, ss: Int, se: Int, al: Int, ac: Huff): Unit = {
      sosHeader(Seq(comp), ss, se, 0, al)
      val bw = new BitWriter(out)
      rstN = 0
      var eobrun = 0
      def flushEobrun(): Unit =
        if (eobrun > 0) {
          val nbits = 31 - Integer.numberOfLeadingZeros(eobrun)
          bw.put(ac.codeOf(nbits << 4), ac.lenOf(nbits << 4))
          if (nbits > 0) bw.put(eobrun & ((1 << nbits) - 1), nbits)
          eobrun = 0
        }
      var blk = 0
      var by = 0
      while (by < nh) {
        var bx = 0
        while (bx < nw) {
          if (restartInterval > 0 && blk > 0 &&
            blk % restartInterval == 0)
            restart(bw, () => flushEobrun())
          val coefb = blocks(bx, by)
          var r = 0
          var k = ss
          while (k <= se) {
            val cv = coefb(Zigzag(k))
            // AC point transform: divide with truncation toward zero
            val t = if (cv < 0) -((-cv) >> al) else cv >> al
            if (t == 0) r += 1
            else {
              flushEobrun()
              while (r > 15) {
                bw.put(ac.codeOf(0xF0), ac.lenOf(0xF0)); r -= 16
              }
              val sz = catOf(t)
              bw.put(ac.codeOf((r << 4) | sz), ac.lenOf((r << 4) | sz))
              bw.put(bitsOf(t, sz), sz)
              r = 0
            }
            k += 1
          }
          if (r > 0) {
            eobrun += 1
            if (eobrun == 0x7FFF) flushEobrun()
          }
          blk += 1
          bx += 1
        }
        by += 1
      }
      flushEobrun()
      bw.flush()
    }

    /** AC refinement pass (G.1.2.3): newly-significant coefficients as
      * (run,1)+sign, correction bits for history coefficients buffered
      * and emitted after the symbol they follow, EOB runs carrying the
      * deferred correction bits of every folded block. */
    def acRefineScan(comp: Int, blocks: (Int, Int) => Array[Int],
        nw: Int, nh: Int, ss: Int, se: Int, al: Int, ac: Huff): Unit = {
      sosHeader(Seq(comp), ss, se, al + 1, al)
      val bw = new BitWriter(out)
      rstN = 0
      var eobrun = 0
      val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
      def flushEobrun(): Unit = {
        if (eobrun > 0) {
          val nbits = 31 - Integer.numberOfLeadingZeros(eobrun)
          bw.put(ac.codeOf(nbits << 4), ac.lenOf(nbits << 4))
          if (nbits > 0) bw.put(eobrun & ((1 << nbits) - 1), nbits)
          eobrun = 0
        }
        pending.foreach(b => bw.put(b, 1))
        pending.clear()
      }
      val absv = new Array[Int](64)
      var blk = 0
      var by = 0
      while (by < nh) {
        var bx = 0
        while (bx < nw) {
          if (restartInterval > 0 && blk > 0 &&
            blk % restartInterval == 0)
            restart(bw, () => flushEobrun())
          val coefb = blocks(bx, by)
          // pre-pass: abs values at this precision + last newly-
          // significant position (EOB folds zero runs past it)
          var eobPos = ss - 1
          var k = ss
          while (k <= se) {
            val a = math.abs(coefb(Zigzag(k))) >> al
            absv(k) = a
            if (a == 1) eobPos = k
            k += 1
          }
          var r = 0
          val blockBits = scala.collection.mutable.ArrayBuffer.empty[Int]
          k = ss
          while (k <= se) {
            val t = absv(k)
            if (t == 0) r += 1
            else {
              while (r > 15 && k <= eobPos) {
                flushEobrun()
                bw.put(ac.codeOf(0xF0), ac.lenOf(0xF0))
                r -= 16
                blockBits.foreach(b => bw.put(b, 1))
                blockBits.clear()
              }
              if (t > 1) blockBits += (t & 1) // history: correction bit
              else {
                flushEobrun()
                bw.put(ac.codeOf((r << 4) | 1), ac.lenOf((r << 4) | 1))
                bw.put(if (coefb(Zigzag(k)) < 0) 0 else 1, 1)
                blockBits.foreach(b => bw.put(b, 1))
                blockBits.clear()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || blockBits.nonEmpty) {
            eobrun += 1
            pending ++= blockBits
            if (eobrun == 0x7FFF || pending.length > 900) flushEobrun()
          }
          blk += 1
          bx += 1
        }
        by += 1
      }
      flushEobrun()
      bw.flush()
    }

    // ---- AC scans: luma split across the fixture's coefficient
    // positions (zigzag 10 in 1..13; 14 and 39 in 14..63), chroma
    // all-zero bands (pure EOB runs), then a luma refinement pass
    acFirstScan(0, yAt, yNbW, yNbH, 1, 13, 1, ProgAcHuff)
    acFirstScan(1, cbAt, cNbW, cNbH, 1, 63, 0, ProgAcHuff)
    acFirstScan(2, crAt, cNbW, cNbH, 1, 63, 0, ProgAcHuff)
    acFirstScan(0, yAt, yNbW, yNbH, 14, 63, 1, ProgAcHuff)
    acRefineScan(0, yAt, yNbW, yNbH, 1, 63, 0, ProgAcHuff)

    // ---- final scan: interleaved DC refinement, Ah=1 Al=0 -----------
    sosHeader(Seq(0, 1, 2), 0, 0, 1, 0)
    locally {
      val bw = new BitWriter(out)
      rstN = 0
      var mcu = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 &&
            mcu % restartInterval == 0) restart(bw, () => ())
          var v = 0
          while (v < 2) {
            var u = 0
            while (u < 2) {
              bw.put(yAt(2 * mx + u, 2 * my + v)(0) & 1, 1)
              u += 1
            }
            v += 1
          }
          bw.put(cbAt(mx, my)(0) & 1, 1)
          bw.put(crAt(mx, my)(0) & 1, 1)
          mcu += 1
          mx += 1
        }
        my += 1
      }
      bw.flush()
    }
    marker(0xD9)
    out.toByteArray
  }

  // ---------------------------------------------------- general encoder

  /** T.81 Annex K example luminance/chrominance quantization tables
    * (natural order), scaled by the libjpeg quality convention. */
  private val QLumBase = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val QChrBase = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  private def scaleQ(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { v =>
      val s = (v * scale + 50) / 100
      math.max(1, math.min(255, s))
    }
  }

  /** Forward DCT of one level-shifted 8×8 block (double, separable —
    * the exact inverse of [[idct]]'s basis). */
  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += in(y * 8 + x) * CosT(x)(u); x += 1 }
        tmp(y * 8 + u) = s
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) {
      var u2 = 0
      while (u2 < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(y * 8 + u2) * CosT(y)(v); y += 1 }
        out(v * 8 + u2) = 0.25 * Cn(u2) * Cn(v) * s
        u2 += 1
      }
      v += 1
    }
  }

  /** Encode ARBITRARY RGB pixels as a baseline 4:2:0 JFIF at the given
    * quality — the general-purpose companion to the coefficient-space
    * fixture [[encode]]: JFIF forward color transform, 2×2 box chroma
    * downsampling with edge replication, FDCT, quality-scaled Annex K
    * quantization (round-half-away), and the same Huffman machinery.
    * Lossy like every JPEG encoder; MultimodalCodecSpec bounds the
    * roundtrip error and cross-checks the stream under ImageIO. */
  /** JFIF color transform + 4:2:0 box downsample of `img` into
    * MCU-padded (edge-replicated) level-shifted planes — shared by the
    * sequential and progressive pixel encoders. Returns (Y, Cb, Cr);
    * plane widths are mcusX*16 and mcusX*8. */
  private def rgbPlanes(img: Multimodal.BmpCodec.Image,
      mcusX: Int, mcusY: Int)
      : (Array[Double], Array[Double], Array[Double]) = {
    val w = img.w; val h = img.h
    val yW = mcusX * 16; val yH = mcusY * 16
    val cW = mcusX * 8; val cH = mcusY * 8
    val yP = new Array[Double](yW * yH)
    val cbP = new Array[Double](cW * cH)
    val crP = new Array[Double](cW * cH)
    var y0 = 0
    while (y0 < yH) {
      var x0 = 0
      while (x0 < yW) {
        val sx = math.min(x0, w - 1); val sy = math.min(y0, h - 1)
        val (r, g, b) = (img.r(sx, sy), img.g(sx, sy), img.b(sx, sy))
        yP(y0 * yW + x0) =
          0.299 * r + 0.587 * g + 0.114 * b - 128.0
        x0 += 1
      }
      y0 += 1
    }
    var cy = 0
    while (cy < cH) {
      var cx = 0
      while (cx < cW) {
        // 2x2 box average in chroma space (edge-replicated samples)
        var sb = 0.0; var sr = 0.0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val sx = math.min(cx * 2 + dx, w - 1)
            val sy = math.min(cy * 2 + dy, h - 1)
            val (r, g, b) = (img.r(sx, sy), img.g(sx, sy), img.b(sx, sy))
            sb += -0.168736 * r - 0.331264 * g + 0.5 * b
            sr += 0.5 * r - 0.418688 * g - 0.081312 * b
            dx += 1
          }
          dy += 1
        }
        cbP(cy * cW + cx) = sb / 4.0
        crP(cy * cW + cx) = sr / 4.0
        cx += 1
      }
      cy += 1
    }
    (yP, cbP, crP)
  }

  /** Encode ARBITRARY RGB pixels as a PROGRESSIVE (SOF2) 4:2:0 JFIF —
    * the write path real web-image pipelines prefer (a truncated
    * prefix still renders a coarse image). Same color transform,
    * downsample, FDCT, and quality-scaled quantization as
    * [[encodePixels]], delivered through [[progressiveBytes]]'s scan
    * script. Progressive encoding needs every block's coefficients
    * resident for the multi-scan passes, so dims are bounded like the
    * decoder's allocation guard. */
  def encodePixelsProgressive(img: Multimodal.BmpCodec.Image,
      quality: Int = 85): Array[Byte] = {
    val w = img.w; val h = img.h
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
      s"unencodable dims ${w}x$h")
    require(w.toLong * h <= (1L << 26),
      s"progressive encode needs resident coefficients: dims ${w}x$h")
    val qLum = scaleQ(QLumBase, quality)
    val qChr = scaleQ(QChrBase, quality)
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    val yW = mcusX * 16
    val cW = mcusX * 8
    val (yP, cbP, crP) = rgbPlanes(img, mcusX, mcusY)
    val blk = new Array[Double](64)
    val fc = new Array[Double](64)
    def qb(plane: Array[Double], pw: Int, bx0: Int, by0: Int,
        q: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) {
        blk(i) = plane((by0 + i / 8) * pw + bx0 + i % 8)
        i += 1
      }
      fdct(blk, fc)
      val coef = new Array[Int](64)
      i = 0
      while (i < 64) {
        val r = math.round(fc(i) / q(i)).toInt
        coef(i) = if (i == 0) r else math.max(-1023, math.min(1023, r))
        i += 1
      }
      coef
    }
    val lumW = 2 * mcusX
    val yB = Array.tabulate(lumW * 2 * mcusY)(i =>
      qb(yP, yW, (i % lumW) * 8, (i / lumW) * 8, qLum))
    val cbB = Array.tabulate(mcusX * mcusY)(i =>
      qb(cbP, cW, (i % mcusX) * 8, (i / mcusX) * 8, qChr))
    val crB = Array.tabulate(mcusX * mcusY)(i =>
      qb(crP, cW, (i % mcusX) * 8, (i / mcusX) * 8, qChr))
    progressiveBytes(w, h, qLum, qChr,
      (bx, by) => yB(by * lumW + bx),
      (bx, by) => cbB(by * mcusX + bx),
      (bx, by) => crB(by * mcusX + bx),
      restartInterval = 0)
  }

  def encodePixels(img: Multimodal.BmpCodec.Image,
      quality: Int = 85): Array[Byte] = {
    val w = img.w; val h = img.h
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
      s"unencodable dims ${w}x$h")
    val qLum = scaleQ(QLumBase, quality)
    val qChr = scaleQ(QChrBase, quality)
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    val yW = mcusX * 16
    val cW = mcusX * 8
    val (yP, cbP, crP) = rgbPlanes(img, mcusX, mcusY)
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    def marker(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def seg(mk: Int, payload: Array[Byte]): Unit = {
      marker(mk)
      val len = payload.length + 2
      out.write(len >>> 8); out.write(len & 0xFF)
      out.write(payload, 0, payload.length)
    }
    marker(0xD8)
    seg(0xE0, "JFIF\u0000".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0))
    val dqt = new Array[Byte](130)
    dqt(0) = 0
    var k = 0
    while (k < 64) { dqt(1 + k) = qLum(Zigzag(k)).toByte; k += 1 }
    dqt(65) = 1
    k = 0
    while (k < 64) { dqt(66 + k) = qChr(Zigzag(k)).toByte; k += 1 }
    seg(0xDB, dqt)
    seg(0xC0, Array[Byte](8, (h >>> 8).toByte, h.toByte,
      (w >>> 8).toByte, w.toByte, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    def dht(cls: Int, tid: Int, bits: Array[Int], vals: Array[Int]) =
      Array(((cls << 4) | tid).toByte) ++
        bits.map(_.toByte) ++ vals.map(_.toByte)
    seg(0xC4, dht(0, 0, DcLumBits, DcVals) ++
      dht(1, 0, AcLumBits, AcLumVals) ++
      dht(0, 1, DcChrBits, DcVals) ++
      dht(1, 1, AcChrBits, AcChrVals))
    seg(0xDA, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val bw = new BitWriter(out)
    val blk = new Array[Double](64)
    val fc = new Array[Double](64)
    val coef = new Array[Int](64)
    def quantBlock(plane: Array[Double], pw: Int, bx0: Int, by0: Int,
        q: Array[Int]): Unit = {
      var i = 0
      while (i < 64) {
        blk(i) = plane((by0 + i / 8) * pw + bx0 + i % 8)
        i += 1
      }
      fdct(blk, fc)
      i = 0
      while (i < 64) {
        val v = fc(i) / q(i)
        // clamp to the baseline 10-bit AC magnitude limit: a full-range
        // checkerboard at quality 100 reaches |1024|, whose size-11
        // category has no symbol in the Annex K AC tables
        val r = math.round(v).toInt
        coef(i) =
          if (i == 0) r else math.max(-1023, math.min(1023, r))
        i += 1
      }
    }
    var predY = 0; var predCb = 0; var predCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var v = 0
        while (v < 2) {
          var u = 0
          while (u < 2) {
            quantBlock(yP, yW, (2 * mx + u) * 8, (2 * my + v) * 8, qLum)
            predY = encodeBlock(bw, coef, predY, HuffDcLum, HuffAcLum)
            u += 1
          }
          v += 1
        }
        quantBlock(cbP, cW, mx * 8, my * 8, qChr)
        predCb = encodeBlock(bw, coef, predCb, HuffDcChr, HuffAcChr)
        quantBlock(crP, cW, mx * 8, my * 8, qChr)
        predCr = encodeBlock(bw, coef, predCr, HuffDcChr, HuffAcChr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xD9)
    out.toByteArray
  }

  // -------------------------------------------------------------- decoder

  /** MSB-first entropy bit reader: un-stuffs 0xFF00; any other marker
    * inside entropy data is an error (restarts are consumed explicitly
    * by [[syncRestart]] between MCUs, never mid-code). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def readBit(): Int = {
      if (n == 0) {
        require(pos < bytes.length, "JPEG entropy stream truncated")
        val b = bytes(pos) & 0xFF; pos += 1
        if (b == 0xFF) {
          require(pos < bytes.length, "JPEG entropy stream truncated at FF")
          val b2 = bytes(pos) & 0xFF; pos += 1
          require(b2 == 0x00,
            f"unexpected marker FF$b2%02X inside entropy data")
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def receive(sz: Int): Int = {
      var v = 0
      var i = 0
      while (i < sz) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker (T.81 E.2.4). */
    def syncRestart(expected: Int): Unit = {
      n = 0
      require(pos + 2 <= bytes.length, "truncated at restart marker")
      val a = bytes(pos) & 0xFF; val b = bytes(pos + 1) & 0xFF
      require(a == 0xFF && b == 0xD0 + expected,
        f"expected RST$expected%d, found $a%02X$b%02X")
      pos += 2
    }
    /** Byte-align after a scan's entropy data and return the offset of
      * the following marker. The only legal bytes between the last
      * entropy bit and the marker are the flush-padding remnant — if
      * that padded byte was 0xFF it carries a 0x00 stuffing byte the
      * bit consumer never loaded, which is skipped here. */
    def markerPos: Int = {
      n = 0
      var p = pos
      while (p + 1 < bytes.length && (bytes(p) & 0xFF) == 0xFF &&
        (bytes(p + 1) & 0xFF) == 0x00) p += 2
      p
    }
  }

  /** T.81 F.2.2.3 DECODE: walk code lengths until the accumulated code
    * fits the canonical range for that length. */
  private def huffDecode(br: BitReader, t: Huff): Int = {
    var code = br.readBit()
    var l = 1
    while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
      code = (code << 1) | br.readBit()
      l += 1
    }
    require(l <= 16, "invalid JPEG Huffman code")
    val idx = t.valPtr(l) + code - t.minCode(l)
    // A table that passed construction keeps idx in range, but a bit
    // stream decoded against a corrupt-yet-constructible table can still
    // land below minCode(l); reject rather than AIOOBE on untrusted bytes.
    require(idx >= 0 && idx < t.vals.length, "corrupt JPEG Huffman decode")
    t.vals(idx)
  }

  /** T.81 F.2.2.1 EXTEND: map sz received bits back to the signed
    * value. */
  private def extend(v: Int, sz: Int): Int =
    if (sz == 0) 0
    else if (v < (1 << (sz - 1))) v - (1 << sz) + 1
    else v

  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((t, u) => math.cos((2 * t + 1) * u * math.Pi / 16))
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Separable double-precision 2-D IDCT + level shift + round + clamp
    * (a production decoder would use AAN; exactness matters more here,
    * and fixture blocks are tiny). */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val c = coef(v * 8 + u)
          if (c != 0) s += Cn(u) * c * CosT(x)(u)
          u += 1
        }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          s += Cn(vv) * tmp(vv * 8 + x) * CosT(y)(vv)
          vv += 1
        }
        val p = math.floor(s / 4.0 + 128.0 + 0.5).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  /** Parse a JPEG from bytes alone: marker walk (APPn/COM skipped,
    * fill bytes tolerated), multi-table DQT (8/16-bit) and DHT
    * segments, SOF0/SOF1 (baseline sequential) or SOF2 (progressive:
    * spectral selection + successive approximation, T.81 Annex G),
    * DRI, then the scan(s). Returns the shared
    * [[Multimodal.BmpCodec.Image]]. Guards mirror the other codecs:
    * dims bounded BEFORE any allocation, component/sampling ranges
    * checked, Huffman/marker/scan-header malformations rejected with
    * clear errors. Other non-baseline frames (lossless, arithmetic,
    * hierarchical) are rejected, not misparsed. */
  def decode(bytes: Array[Byte]): Multimodal.BmpCodec.Image =
    decodeImpl(bytes, dcOnly = false)

  /** DC-only "thumbnail" decode: one GRAY pixel per LUMA block — the
    * 1/8-scale image the DC coefficients alone reconstruct (the IDCT
    * of a DC-only block is flat, `floor(dc/8 + 128.5)`), which is all
    * a perceptual fingerprint like [[Multimodal.dhashOf]] needs. The
    * scale payoff is wire-format dependent:
    *
    *   - PROGRESSIVE input: AC scans are never entropy-decoded at all
    *     — the reader byte-skips each `Ss > 0` scan to its trailing
    *     marker (stuffing makes in-scan 0xFF bytes unambiguous), so
    *     the cost is O(DC-scan bytes + a byte scan), not O(Huffman
    *     symbols). Fingerprinting a petabyte of progressive web JPEGs
    *     touches a few percent of the entropy-coded work. A corrupted
    *     AC scan cannot even be noticed — by design (the honesty
    *     property DcThumbnailSpec pins).
    *   - BASELINE input: AC coefficients interleave with DC inside
    *     every block, so the Huffman walk still runs; only the IDCT,
    *     chroma planes, upsampling, and color conversion are skipped.
    *
    * DC refinement scans (successive approximation) are folded in, so
    * the thumbnail is exact, not an Al-truncated approximation. */
  def decodeLumaDcThumbnail(bytes: Array[Byte]): Multimodal.BmpCodec.Image =
    decodeImpl(bytes, dcOnly = true)

  private def decodeImpl(bytes: Array[Byte],
      dcOnly: Boolean): Multimodal.BmpCodec.Image = {
    require(bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8, "not a JPEG file")
    def u16(o: Int): Int = {
      require(o + 2 <= bytes.length, "truncated JPEG segment")
      ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
    }
    val qt = Array.ofDim[Int](4, 64) // dezigzagged at parse
    val huffs = new Array[Huff](8) // index: class*4 + tableId
    var w = 0; var h = 0
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var restartInterval = 0
    // progressive-frame state: per-component raw (unquantized)
    // coefficient stores accumulated across scans, reconstructed at EOI
    var progressive = false
    var sawScan = false
    var hmax = 1; var vmax = 1
    var mcusX = 0; var mcusY = 0
    var blocksW: Array[Int] = null // MCU-padded grid (interleaved scans)
    var blocksH: Array[Int] = null
    var nbW: Array[Int] = null // ceil grid (non-interleaved scans)
    var nbH: Array[Int] = null
    var coefStore: Array[Array[Int]] = null
    var off = 2
    while (off + 2 <= bytes.length) {
      require((bytes(off) & 0xFF) == 0xFF,
        f"JPEG marker expected at offset $off")
      while (off + 1 < bytes.length && (bytes(off + 1) & 0xFF) == 0xFF)
        off += 1 // optional fill bytes
      val mk = bytes(off + 1) & 0xFF
      off += 2
      mk match {
        case 0xDB => // DQT: one or more tables
          val len = u16(off)
          val end = off + len
          require(end <= bytes.length, "truncated DQT")
          var p = off + 2
          while (p < end) {
            val pq = (bytes(p) & 0xFF) >>> 4
            val tq = bytes(p) & 0x0F
            require(pq <= 1 && tq <= 3, s"bad DQT header pq=$pq tq=$tq")
            p += 1
            require(p + (if (pq == 0) 64 else 128) <= end, "short DQT table")
            var k = 0
            while (k < 64) {
              val v =
                if (pq == 0) bytes(p + k) & 0xFF
                else ((bytes(p + 2 * k) & 0xFF) << 8) |
                  (bytes(p + 2 * k + 1) & 0xFF)
              qt(tq)(Zigzag(k)) = v
              k += 1
            }
            p += (if (pq == 0) 64 else 128)
          }
          off = end
        case 0xC4 => // DHT: one or more tables
          val len = u16(off)
          val end = off + len
          require(end <= bytes.length, "truncated DHT")
          var p = off + 2
          while (p < end) {
            val tc = (bytes(p) & 0xFF) >>> 4
            val th = bytes(p) & 0x0F
            require(tc <= 1 && th <= 3, s"bad DHT header tc=$tc th=$th")
            p += 1
            require(p + 16 <= end, "short DHT bits")
            val bits = Array.tabulate(16)(i => bytes(p + i) & 0xFF)
            p += 16
            val n = bits.sum
            require(n <= 256 && p + n <= end, "short DHT values")
            val vals = Array.tabulate(n)(i => bytes(p + i) & 0xFF)
            p += n
            huffs(tc * 4 + th) = new Huff(bits, vals)
          }
          off = end
        case 0xC0 | 0xC1 | 0xC2 =>
          // SOF0 baseline (SOF1 ext-sequential: same wire), or SOF2
          // progressive (same frame header; the scans differ)
          require(nComp == 0, "multiple SOF markers")
          progressive = mk == 0xC2
          val len = u16(off)
          require(off + len <= bytes.length && len >= 8, "truncated SOF")
          require((bytes(off + 2) & 0xFF) == 8,
            "unsupported JPEG sample precision")
          h = u16(off + 3)
          w = u16(off + 5)
          nComp = bytes(off + 7) & 0xFF
          require(w > 0 && h > 0, "JPEG with zero dimension (DNL unsupported)")
          // bound BEFORE allocation: a crafted 65535×65535 header would
          // otherwise commit ~12 GB of planes
          require(w.toLong * h <= (1L << 26),
        s"implausible JPEG dims ${w}x$h")
          require(nComp == 1 || nComp == 3,
            s"unsupported JPEG component count $nComp")
          require(len == 8 + 3 * nComp, "SOF length mismatch")
          compId = new Array[Int](nComp)
          compH = new Array[Int](nComp)
          compV = new Array[Int](nComp)
          compQ = new Array[Int](nComp)
          var i = 0
          while (i < nComp) {
            compId(i) = bytes(off + 8 + 3 * i) & 0xFF
            val hv = bytes(off + 9 + 3 * i) & 0xFF
            compH(i) = hv >>> 4
            compV(i) = hv & 0x0F
            compQ(i) = bytes(off + 10 + 3 * i) & 0xFF
            require(compH(i) >= 1 && compH(i) <= 4 &&
              compV(i) >= 1 && compV(i) <= 4,
              s"bad sampling factors ${compH(i)}x${compV(i)}")
            require(compQ(i) <= 3, "bad quant table selector")
            i += 1
          }
          i = 0
          while (i < nComp) {
            if (compH(i) > hmax) hmax = compH(i)
            if (compV(i) > vmax) vmax = compV(i)
            i += 1
          }
          mcusX = (w + 8 * hmax - 1) / (8 * hmax)
          mcusY = (h + 8 * vmax - 1) / (8 * vmax)
          blocksW = Array.tabulate(nComp)(c => mcusX * compH(c))
          blocksH = Array.tabulate(nComp)(c => mcusY * compV(c))
          // non-interleaved scan grid: ceil(ceil(dim·h_i/hmax)/8)
          // (T.81 A.1.1 — NOT the MCU-padded grid)
          nbW = Array.tabulate(nComp)(c =>
            ((w * compH(c) + hmax - 1) / hmax + 7) / 8)
          nbH = Array.tabulate(nComp)(c =>
            ((h * compV(c) + vmax - 1) / vmax + 7) / 8)
          if (progressive)
            coefStore = Array.tabulate(nComp)(c =>
              new Array[Int](blocksW(c) * blocksH(c) * 64))
          off += len
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
            0xCD | 0xCE | 0xCF =>
          throw new IllegalArgumentException(
            f"unsupported JPEG frame type SOF (marker FF$mk%02X) — " +
              "only baseline sequential and progressive are implemented")
        case 0xDD => // DRI
          require(u16(off) == 4, "bad DRI length")
          restartInterval = u16(off + 2)
          off += 4
        case 0xDA => // SOS — one (baseline) or one-of-many (progressive)
          require(nComp > 0, "SOS before SOF")
          val len = u16(off)
          require(off + len <= bytes.length, "truncated SOS")
          val ns = bytes(off + 2) & 0xFF
          require(ns >= 1 && ns <= nComp && len == 6 + 2 * ns,
            "bad SOS header")
          val scanDc = new Array[Huff](ns)
          val scanAc = new Array[Huff](ns)
          val scanComp = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cs = bytes(off + 3 + 2 * i) & 0xFF
            val ci = compId.indexOf(cs)
            require(ci >= 0, s"SOS references unknown component $cs")
            scanComp(i) = ci
            val tdta = bytes(off + 4 + 2 * i) & 0xFF
            require((tdta >>> 4) <= 3 && (tdta & 0x0F) <= 3,
              s"bad SOS Huffman table selector $tdta")
            scanDc(i) = huffs(tdta >>> 4) // class 0 lives at index th
            scanAc(i) = huffs(4 + (tdta & 0x0F))
            i += 1
          }
          val ss = bytes(off + 3 + 2 * ns) & 0xFF
          val se = bytes(off + 4 + 2 * ns) & 0xFF
          val ahal = bytes(off + 5 + 2 * ns) & 0xFF
          val ah = ahal >>> 4
          val al = ahal & 0x0F
          if (!progressive) {
            require(ns == nComp, "partial-scan JPEGs unsupported")
            require(ss == 0 && se == 63 && ahal == 0,
              "non-baseline spectral selection/approximation")
            i = 0
            while (i < ns) {
              require(scanDc(i) != null && scanAc(i) != null,
                "SOS references undefined Huffman table")
              i += 1
            }
            return decodeScan(bytes, off + len, w, h, nComp,
              compH, compV, compQ, qt, scanComp, scanDc, scanAc,
              restartInterval, dcOnly)
          }
          // progressive scan-header validation (T.81 B.2.3 / G.1.1.1)
          if (ss == 0)
            require(se == 0, "progressive DC scan with Se != 0")
          else {
            require(ns == 1, "progressive AC scan must be non-interleaved")
            require(ss <= se && se <= 63, s"bad spectral band $ss..$se")
          }
          require(al <= 13 && (ah == 0 || ah == al + 1),
            s"bad successive approximation Ah=$ah Al=$al")
          i = 0
          while (i < ns) {
            if (ss == 0 && ah == 0)
              require(scanDc(i) != null,
                "DC scan references undefined Huffman table")
            if (ss > 0)
              require(scanAc(i) != null,
                "AC scan references undefined Huffman table")
            i += 1
          }
          sawScan = true
          off =
            if (dcOnly && ss > 0)
              // AC scans carry nothing a DC thumbnail needs: skip the
              // entropy bytes wholesale (see decodeLumaDcThumbnail)
              skipEntropyData(bytes, off + len)
            else decodeProgScan(bytes, off + len, scanComp, scanDc,
              scanAc, ss, se, ah, al, mcusX, mcusY, compH, compV,
              blocksW, nbW, nbH, coefStore, restartInterval)
        case 0xD9 =>
          if (progressive && sawScan) {
            if (dcOnly) {
              val q0 = qt(compQ(0))(0)
              val tw = nbW(0); val th = nbH(0)
              val store = coefStore(0)
              return dcThumb(tw, th, blocksW(0), (bx, by) =>
                store((by * blocksW(0) + bx) * 64) * q0)
            }
            return reconstructProg(w, h, nComp, compH, compV, compQ,
              qt, hmax, vmax, blocksW, blocksH, coefStore)
          }
          throw new IllegalArgumentException("EOI before any scan")
        case a if (a >= 0xE0 && a <= 0xEF) || a == 0xFE => // APPn / COM
          off += u16(off)
        case other =>
          throw new IllegalArgumentException(
            f"unexpected JPEG marker FF$other%02X")
      }
    }
    throw new IllegalArgumentException("no scan in JPEG stream")
  }

  /** Scan forward from `from` (inside entropy-coded data) to the next
    * real marker: 0xFF followed by anything other than 0x00 (byte
    * stuffing) or D0-D7 (restart markers) ends the scan. Returns the
    * offset OF the 0xFF. */
  private def skipEntropyData(bytes: Array[Byte], from: Int): Int = {
    var o = from
    while (o + 1 < bytes.length) {
      if ((bytes(o) & 0xFF) == 0xFF) {
        val nx = bytes(o + 1) & 0xFF
        if (nx != 0x00 && (nx < 0xD0 || nx > 0xD7)) return o
        o += 2
      } else o += 1
    }
    throw new IllegalArgumentException("unterminated JPEG scan")
  }

  /** Gray tw×th image from per-block dequantized luma DC values:
    * the flat IDCT sample `floor(dc/8 + 128.5)`, clamped. */
  private def dcThumb(tw: Int, th: Int, stride: Int,
      dcDeqAt: (Int, Int) => Int): Multimodal.BmpCodec.Image = {
    val px = new Array[Byte](tw * th * 3)
    var by = 0
    while (by < th) {
      var bx = 0
      while (bx < tw) {
        val p = math.floor(dcDeqAt(bx, by) / 8.0 + 128.5).toInt
        val v = (if (p < 0) 0 else if (p > 255) 255 else p).toByte
        val o = (by * tw + bx) * 3
        px(o) = v; px(o + 1) = v; px(o + 2) = v
        bx += 1
      }
      by += 1
    }
    Multimodal.BmpCodec.Image(tw, th, px)
  }

  /** Interleaved baseline scan: per MCU, each component's h×v blocks
    * (Huffman decode → dequant → dezigzag → IDCT) into its subsampled
    * plane; then nearest-sample upsampling + JFIF color conversion,
    * cropped to w×h. */
  private def decodeScan(bytes: Array[Byte], scanStart: Int,
      w: Int, h: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      qt: Array[Array[Int]], scanComp: Array[Int],
      scanDc: Array[Huff], scanAc: Array[Huff],
      restartInterval: Int, dcOnly: Boolean): Multimodal.BmpCodec.Image = {
    var hmax = 1; var vmax = 1
    var i = 0
    while (i < nComp) {
      if (compH(i) > hmax) hmax = compH(i)
      if (compV(i) > vmax) vmax = compV(i)
      i += 1
    }
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val planeW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * compV(c) * 8)
    // dcOnly: only the luma DC plane is kept (one int per block) —
    // the Huffman walk below still advances through every AC symbol
    // (baseline interleaves them), but IDCT/upsample/color are skipped
    val planes =
      if (dcOnly) null
      else Array.tabulate(nComp)(c => new Array[Int](planeW(c) * planeH(c)))
    val dcPlaneW = mcusX * compH(0)
    val dcPlane = if (dcOnly) new Array[Int](dcPlaneW * mcusY * compV(0))
      else null
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val samp = new Array[Int](64)
    val br = new BitReader(bytes, scanStart)
    var mcu = 0
    var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.syncRestart(rstN)
          rstN = (rstN + 1) & 7
          java.util.Arrays.fill(pred, 0)
        }
        var s = 0
        while (s < nComp) {
          val c = scanComp(s)
          val q = qt(compQ(c))
          var v = 0
          while (v < compV(c)) {
            var u = 0
            while (u < compH(c)) {
              java.util.Arrays.fill(coef, 0)
              val t = huffDecode(br, scanDc(s))
              require(t <= 15, s"bad DC category $t")
              pred(c) += extend(br.receive(t), t)
              coef(0) = pred(c) * q(0)
              var k = 1
              while (k < 64) {
                val rs = huffDecode(br, scanAc(s))
                val r = rs >>> 4
                val sz = rs & 0x0F
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL: sixteen zeros
                  else k = 64 // EOB
                } else {
                  k += r
                  require(k < 64, "AC coefficient run overflows block")
                  val nz = Zigzag(k)
                  coef(nz) = extend(br.receive(sz), sz) * q(nz)
                  k += 1
                }
              }
              if (dcOnly) {
                if (c == 0)
                  dcPlane((my * compV(0) + v) * dcPlaneW +
                    mx * compH(0) + u) = coef(0)
              } else {
                idct(coef, samp)
                val bx0 = (mx * compH(c) + u) * 8
                val by0 = (my * compV(c) + v) * 8
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  val row = (by0 + yy) * planeW(c) + bx0
                  while (xx < 8) {
                    planes(c)(row + xx) = samp(yy * 8 + xx)
                    xx += 1
                  }
                  yy += 1
                }
              }
              u += 1
            }
            v += 1
          }
          s += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    if (dcOnly) {
      val tw = ((w * compH(0) + hmax - 1) / hmax + 7) / 8
      val th = ((h * compV(0) + vmax - 1) / vmax + 7) / 8
      dcThumb(tw, th, dcPlaneW, (bx, by) => dcPlane(by * dcPlaneW + bx))
    } else
      assemble(w, h, nComp, compH, compV, hmax, vmax, planes, planeW)
  }

  /** Shared tail of both decode paths: nearest-sample chroma upsampling
    * + JFIF color conversion, cropped to w×h. */
  private def assemble(w: Int, h: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], hmax: Int, vmax: Int,
      planes: Array[Array[Int]],
      planeW: Array[Int]): Multimodal.BmpCodec.Image = {
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        val yv = planes(0)(
          (y * compV(0) / vmax) * planeW(0) + x * compH(0) / hmax)
        if (nComp == 1) {
          px(o) = yv.toByte; px(o + 1) = yv.toByte; px(o + 2) = yv.toByte
        } else {
          val cb = planes(1)(
            (y * compV(1) / vmax) * planeW(1) + x * compH(1) / hmax)
          val cr = planes(2)(
            (y * compV(2) / vmax) * planeW(2) + x * compH(2) / hmax)
          px(o) = ycc2r(yv, cr).toByte
          px(o + 1) = ycc2g(yv, cb, cr).toByte
          px(o + 2) = ycc2b(yv, cb).toByte
        }
        x += 1
      }
      y += 1
    }
    Multimodal.BmpCodec.Image(w, h, px)
  }

  /** One progressive scan (T.81 G.2): decodes into the raw
    * (unquantized) per-component coefficient stores and returns the
    * byte offset of the marker that follows the entropy data. DC scans
    * may be interleaved over the MCU grid; AC scans are always
    * single-component over the component's own ceil-block grid. First
    * passes (Ah=0) carry point-transformed values; refinement passes
    * (Ah=Al+1) add one magnitude bit per coded coefficient, with EOB
    * runs spanning blocks in both (figure G.7 semantics — newly-
    * significant coefficients interleave with correction bits for
    * history coefficients, which is why decode order is load-bearing). */
  private def decodeProgScan(bytes: Array[Byte], start: Int,
      scanComp: Array[Int], scanDc: Array[Huff], scanAc: Array[Huff],
      ss: Int, se: Int, ah: Int, al: Int,
      mcusX: Int, mcusY: Int,
      compH: Array[Int], compV: Array[Int],
      blocksW: Array[Int], nbW: Array[Int], nbH: Array[Int],
      coefStore: Array[Array[Int]], restartInterval: Int): Int = {
    val br = new BitReader(bytes, start)
    val ns = scanComp.length
    var eobrun = 0
    val pred = new Array[Int](coefStore.length)
    var rstN = 0
    var unit = 0 // restart-interval unit: MCU (interleaved) or block

    def maybeRestart(): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.syncRestart(rstN)
        rstN = (rstN + 1) & 7
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }

    def dcBlock(c: Int, s: Int, base: Int): Unit =
      if (ah == 0) {
        val t = huffDecode(br, scanDc(s))
        require(t <= 15, s"bad DC category $t")
        pred(c) += extend(br.receive(t), t)
        coefStore(c)(base) = pred(c) << al
      } else if (br.readBit() == 1) coefStore(c)(base) |= 1 << al

    if (ss == 0) {
      if (ns > 1) { // interleaved DC scan over the MCU grid
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            var s = 0
            while (s < ns) {
              val c = scanComp(s)
              var v = 0
              while (v < compV(c)) {
                var u = 0
                while (u < compH(c)) {
                  val by = my * compV(c) + v
                  val bx = mx * compH(c) + u
                  dcBlock(c, s, (by * blocksW(c) + bx) * 64)
                  u += 1
                }
                v += 1
              }
              s += 1
            }
            unit += 1
            mx += 1
          }
          my += 1
        }
      } else { // non-interleaved DC scan
        val c = scanComp(0)
        var by = 0
        while (by < nbH(c)) {
          var bx = 0
          while (bx < nbW(c)) {
            maybeRestart()
            dcBlock(c, 0, (by * blocksW(c) + bx) * 64)
            unit += 1
            bx += 1
          }
          by += 1
        }
      }
    } else { // AC scan — always non-interleaved (T.81 B.2.3)
      val c = scanComp(0)
      val ac = scanAc(0)
      val coefs = coefStore(c)
      val p1 = 1 << al
      val m1 = -1 << al
      var by = 0
      while (by < nbH(c)) {
        var bx = 0
        while (bx < nbW(c)) {
          maybeRestart()
          val base = (by * blocksW(c) + bx) * 64
          if (ah == 0) {
            // first pass: run-lengths at this precision + EOB runs
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              while (k <= se) {
                val rs = huffDecode(br, ac)
                val r = rs >>> 4
                val sz = rs & 0x0F
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else {
                    eobrun = (1 << r) - 1
                    if (r > 0) eobrun += br.receive(r)
                    k = 64 // EOB: rest of this block is zero
                  }
                } else {
                  k += r
                  require(k <= se, "AC run overflows spectral band")
                  coefs(base + Zigzag(k)) =
                    extend(br.receive(sz), sz) << al
                  k += 1
                }
              }
            }
          } else {
            // refinement pass
            var k = ss
            if (eobrun == 0) {
              var inBlock = true
              while (inBlock && k <= se) {
                val rs = huffDecode(br, ac)
                var r = rs >>> 4
                val sz = rs & 0x0F
                var newVal = 0
                if (sz == 0) {
                  if (r != 15) { // EOBn: tail handled by the run logic
                    eobrun = 1 << r
                    if (r > 0) eobrun += br.receive(r)
                    inBlock = false
                  } // r == 15: ZRL — skip 16 zero-history coefficients
                } else {
                  require(sz == 1, "bad AC refinement magnitude")
                  newVal = if (br.readBit() == 1) p1 else m1
                }
                if (inBlock) {
                  // advance over r zero-history coefficients, reading a
                  // correction bit at every nonzero one passed
                  var advancing = true
                  while (advancing && k <= se) {
                    val idx = base + Zigzag(k)
                    val cv = coefs(idx)
                    if (cv != 0) {
                      if (br.readBit() == 1 && (cv & p1) == 0)
                        coefs(idx) = cv + (if (cv >= 0) p1 else m1)
                      k += 1
                    } else if (r == 0) advancing = false
                    else { r -= 1; k += 1 }
                  }
                  if (newVal != 0) {
                    require(k <= se,
                      "AC refinement placement overflows band")
                    coefs(base + Zigzag(k)) = newVal
                  }
                  k += 1
                }
              }
            }
            if (eobrun > 0) {
              // block inside an EOB run: correction bits only
              while (k <= se) {
                val idx = base + Zigzag(k)
                val cv = coefs(idx)
                if (cv != 0 && br.readBit() == 1 && (cv & p1) == 0)
                  coefs(idx) = cv + (if (cv >= 0) p1 else m1)
                k += 1
              }
              eobrun -= 1
            }
          }
          unit += 1
          bx += 1
        }
        by += 1
      }
    }
    br.markerPos
  }

  /** Final pass of progressive decode: dequantize + IDCT every block of
    * the accumulated coefficient stores, then the shared upsample +
    * color-convert tail. */
  private def reconstructProg(w: Int, h: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      qt: Array[Array[Int]], hmax: Int, vmax: Int,
      blocksW: Array[Int], blocksH: Array[Int],
      coefStore: Array[Array[Int]]): Multimodal.BmpCodec.Image = {
    val planeW = Array.tabulate(nComp)(c => blocksW(c) * 8)
    val planes = Array.tabulate(nComp)(c =>
      new Array[Int](planeW(c) * blocksH(c) * 8))
    val coef = new Array[Int](64)
    val samp = new Array[Int](64)
    var c = 0
    while (c < nComp) {
      val q = qt(compQ(c))
      val store = coefStore(c)
      var by = 0
      while (by < blocksH(c)) {
        var bx = 0
        while (bx < blocksW(c)) {
          val base = (by * blocksW(c) + bx) * 64
          var i = 0
          while (i < 64) { coef(i) = store(base + i) * q(i); i += 1 }
          idct(coef, samp)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            val row = (by * 8 + yy) * planeW(c) + bx * 8
            while (xx < 8) {
              planes(c)(row + xx) = samp(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    assemble(w, h, nComp, compH, compV, hmax, vmax, planes, planeW)
  }
}
