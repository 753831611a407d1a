package graft.operators

/** Clean-room RFC 7932 (brotli) DECODER — the `Content-Encoding: br`
  * a large share of real crawl captures carry. No brotli jar exists
  * on Spark's classpath, so this is built from the RFC alone (the
  * FlacCodec/JpegCodec discipline): LSB-first bit reader, WBITS
  * window header, metablock framing (compressed, uncompressed, and
  * metadata-skip), simple + complex prefix codes (code-length code
  * with 16/17 repeat accumulation, canonical assignment), block-type
  * switching in all three categories, context maps with RLE + inverse
  * move-to-front, the 704-symbol insert-and-copy command alphabet,
  * the 4-slot distance ring with all 16 short codes,
  * NPOSTFIX/NDIRECT distance composition, all four literal-context
  * modes (LSB6/MSB6/UTF8/Signed via the §7.1 lookup tables), and
  * static-dictionary references (§8) with the full Appendix A
  * dictionary and all 121 Appendix B word transforms.
  *
  * The appendix/§7.1 DATA (the 122,784-byte dictionary, the
  * transform table, the 2,048-byte context lookup table) is public
  * spec content printed in RFC 7932 itself; it ships as resource
  * files under graft/brotli/ (see tools/brotli_dict_extract.py for
  * how the bytes were sourced offline and structurally verified
  * against the RFC's SIZE_BITS/offset tables and §7.1 closed forms).
  *
  * Rejection discipline: malformed streams (framing, prefix-code,
  * truncation, bad dictionary reference) throw
  * IllegalArgumentException = data corruption, fail the record;
  * VALID-but-outside-this-decoder constructs (the non-RFC
  * large-window WBITS extension, outputs past the bomb cap) throw
  * [[BrotliCodec.Unsupported]] so a scan can degrade to the raw body
  * instead of failing the task (round-16 verdict #1).
  *
  * Reference: RFC 7932 §§2-10 (stream layout, prefix codes, context
  * modeling, command alphabet, distance codes, static dictionary).
  */
object BrotliCodec extends Serializable {

  /** Valid-but-out-of-subset input: the caller may degrade (keep the
    * raw body and its `br` flag) instead of failing the task. Corrupt
    * input throws IllegalArgumentException instead. */
  final class Unsupported(msg: String) extends RuntimeException(msg)

  private def loadRes(name: String, want: Int): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing resource $name")
    try {
      val b = in.readAllBytes()
      require(b.length == want, s"$name: ${b.length} B, want $want")
      b
    } finally in.close()
  }

  // ---- RFC 7932 Appendix A: static dictionary ---------------------------
  // words of length L (4..24) live at DictOffsets(L), 2^DictSizeBits(L)
  // of them, concatenated without separators
  private val DictSizeBits: Array[Int] =
    Array(0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7,
      7, 8, 7, 7, 6, 6, 5, 5)
  private val DictOffsets: Array[Int] = {
    val o = new Array[Int](26)
    var l = 4
    while (l < 25) { o(l + 1) = o(l) + (l << DictSizeBits(l)); l += 1 }
    // offsets 0..3 unused (no words shorter than 4)
    java.util.Arrays.copyOfRange(o, 0, 25)
  }
  private lazy val Dict: Array[Byte] =
    loadRes("/graft/brotli/dictionary.bin", 122784)

  // ---- RFC 7932 §7.1: literal context lookup tables ---------------------
  // 512 bytes per mode (LSB6, MSB6, UTF8, Signed):
  //   CONTEXT = lut(mode*512 + p1) | lut(mode*512 + 256 + p2)
  private lazy val CtxLut: Array[Byte] =
    loadRes("/graft/brotli/context_lut.bin", 2048)

  // ---- RFC 7932 Appendix B: the 121 word transforms ---------------------
  // ops: 0 identity, 1 ferment-first, 2 ferment-all,
  //      10+n omit-first-n (1..9), 20+n omit-last-n (1..9)
  private lazy val Transforms: Array[(Int, Array[Byte], Array[Byte])] = {
    val in = getClass.getResourceAsStream("/graft/brotli/transforms.tsv")
    require(in != null, "missing resource /graft/brotli/transforms.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val t = src.getLines().map { line =>
        val Array(op, pre, suf) = line.split("\t", -1)
        val code = op match {
          case "identity" => 0
          case "ferment_first" => 1
          case "ferment_all" => 2
          case s if s.startsWith("omit_first_") => 10 + s.substring(11).toInt
          case s if s.startsWith("omit_last_") => 20 + s.substring(10).toInt
        }
        def hex(h: String): Array[Byte] =
          h.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
        (code, hex(pre), hex(suf))
      }.toArray
      require(t.length == 121, s"${t.length} transforms, want 121")
      t
    } finally src.close()
  }

  /** UTF-8-aware uppercasing (§8): single ferment step at `i`,
    * returning the width consumed. */
  private def fermentAt(w: Array[Byte], i: Int): Int = {
    val c = w(i) & 0xFF
    if (c < 192) {
      if (c >= 'a' && c <= 'z') w(i) = (c ^ 32).toByte
      1
    } else if (c < 224) {
      if (i + 1 < w.length) w(i + 1) = (w(i + 1) ^ 32).toByte
      2
    } else {
      if (i + 2 < w.length) w(i + 2) = (w(i + 2) ^ 5).toByte
      3
    }
  }

  /** Transformed dictionary word: prefix + op(word) + suffix. */
  private def transformWord(wordOff: Int, wordLen: Int, id: Int)
      : Array[Byte] = {
    val (op, pre, suf) = Transforms(id)
    val core: Array[Byte] = op match {
      case 0 | 1 | 2 =>
        val w = java.util.Arrays.copyOfRange(Dict, wordOff, wordOff + wordLen)
        if (op == 1) fermentAt(w, 0)
        else if (op == 2) {
          var i = 0
          while (i < w.length) i += fermentAt(w, i)
        }
        w
      case n if n >= 10 && n < 20 => // omit first n-10
        val k = math.min(n - 10, wordLen)
        java.util.Arrays.copyOfRange(Dict, wordOff + k, wordOff + wordLen)
      case n => // omit last n-20
        val k = math.min(n - 20, wordLen)
        java.util.Arrays.copyOfRange(Dict, wordOff, wordOff + wordLen - k)
    }
    val out = new Array[Byte](pre.length + core.length + suf.length)
    System.arraycopy(pre, 0, out, 0, pre.length)
    System.arraycopy(core, 0, out, pre.length, core.length)
    System.arraycopy(suf, 0, out, pre.length + core.length, suf.length)
    out
  }

  /** LSB-first bit reader (the DEFLATE bit order brotli shares) over
    * a 64-bit accumulator — bytes load 8 at a time off the hot path,
    * `bits(n)` is a mask+shift. The accumulator form is what takes
    * the decoder from ~30 MB/s (bit-at-a-time array walks) into the
    * hundreds: CE decode of a crawl runs this loop per PAGE BYTE. */
  private final class BitReader(data: Array[Byte]) {
    private val n = data.length
    private var bytePos = 0 // next byte to load into the accumulator
    private var acc = 0L    // LSB-first pending bits
    private var accBits = 0

    private def refill(): Unit = {
      while (accBits <= 56 && bytePos < n) {
        acc |= (data(bytePos) & 0xFFL) << accBits
        accBits += 8
        bytePos += 1
      }
    }

    def bits(nb: Int): Int = {
      if (accBits < nb) {
        refill()
        require(accBits >= nb, "brotli stream truncated")
      }
      val v = (acc & ((1L << nb) - 1)).toInt
      acc >>>= nb
      accBits -= nb
      v
    }

    def bit(): Int = bits(1)

    /** Next 15 stream bits, LSB-first, zero-padded past EOF (padding
      * can only select a SHORTER valid code, never lengthen one — see
      * PrefixCode.decode). */
    def peek15(): Int = {
      if (accBits < 15) refill()
      (acc & 0x7FFF).toInt
    }

    /** Drop `nb` bits previously peeked. */
    def consume(nb: Int): Unit = {
      require(accBits >= nb, "brotli stream truncated")
      acc >>>= nb
      accBits -= nb
    }

    /** Byte alignment before uncompressed/metadata payloads — the
      * skipped bits are ignored (RFC 7932 §9.2). */
    def alignByte(): Unit = {
      val drop = accBits & 7
      acc >>>= drop
      accBits -= drop
    }

    /** Byte offset of the next unread bit; callable only at byte
      * alignment (after [[alignByte]]). */
    def byteOffset: Int = {
      require((accBits & 7) == 0, "unaligned byteOffset")
      bytePos - (accBits >> 3)
    }

    def skipBytes(m: Int): Unit = {
      val cur = byteOffset
      require(cur + m <= n, "brotli metadata truncated")
      bytePos = cur + m
      acc = 0L
      accBits = 0
    }
  }

  /** Canonical prefix code: `lengths(sym)` in 0..15 (0 = absent).
    * DEFLATE-style canonical assignment (codes in increasing symbol
    * order per length — RFC 7932 §3.2), read MSB-of-code-first via
    * tree walk. A single-symbol code reads ZERO bits. */
  private final class PrefixCode(lengths: Array[Int]) {
    // constructed once PER METABLOCK per tree — collection ops here
    // (boxed .max/.foreach) dominated whole-stream profiles on
    // many-metablock q0/q1 streams; everything is while-loops
    private val maxLen = {
      var m = 0
      var i = 0
      while (i < lengths.length) {
        if (lengths(i) > m) m = lengths(i)
        i += 1
      }
      m
    }
    private val single: Int = {
      var s = -1
      var n = 0
      var i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { s = i; n += 1 }
        i += 1
      }
      require(n > 0, "empty prefix code")
      if (n == 1) s else -1
    }
    private var counts: Array[Int] = _
    private var firstCode: Array[Int] = _
    private var offsets: Array[Int] = _
    private var symbols: Array[Int] = _
    if (single < 0) {
      counts = new Array[Int](maxLen + 1)
      var li = 0
      while (li < lengths.length) {
        if (lengths(li) > 0) counts(lengths(li)) += 1
        li += 1
      }
      // completeness: Σ 2^(maxLen - len) must be exactly 2^maxLen
      var space = 0L
      var l = 1
      while (l <= maxLen) {
        space += counts(l).toLong << (maxLen - l)
        l += 1
      }
      require(space == (1L << maxLen),
        s"incomplete/overfull prefix code (space $space of " +
          s"${1L << maxLen})")
      firstCode = new Array[Int](maxLen + 1)
      offsets = new Array[Int](maxLen + 1)
      var code = 0
      var total = 0
      l = 1
      while (l <= maxLen) {
        firstCode(l) = code
        offsets(l) = total
        code = (code + counts(l)) << 1
        total += counts(l)
        l += 1
      }
      symbols = new Array[Int](total)
      val next = offsets.clone()
      var s = 0
      while (s < lengths.length) {
        val ln = lengths(s)
        if (ln > 0) { symbols(next(ln)) = s; next(ln) += 1 }
        s += 1
      }
    }

    // one-level fast table over the first 8 code bits: entry =
    // (len << 16) | sym for codes of length <= 8 (which carry nearly
    // all the probability mass in real streams); 0 = longer code,
    // fall back to the canonical walk. Indexed by the MSB-first code
    // prefix — Rev8 of the LSB-first peeked byte.
    private val table: Array[Int] =
      if (single >= 0) null
      else {
        val t = new Array[Int](256)
        var l = 1
        while (l <= math.min(maxLen, 8)) {
          var k = 0
          while (k < counts(l)) {
            val code = firstCode(l) + k
            val sym = symbols(offsets(l) + k)
            val base = code << (8 - l)
            var s = 0
            while (s < (1 << (8 - l))) {
              t(base | s) = (l << 16) | sym
              s += 1
            }
            k += 1
          }
          l += 1
        }
        t
      }

    def decode(br: BitReader): Int = {
      if (single >= 0) return single
      val e = table(Rev8(br.peek15() & 0xFF))
      if (e != 0) {
        br.consume(e >>> 16)
        return e & 0xFFFF
      }
      // long code (> 8 bits): canonical walk from the start — only the
      // non-consuming peek happened above
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.bit()
        len += 1
        if (code >= firstCode(len) &&
            code - firstCode(len) < counts(len))
          return symbols(offsets(len) + code - firstCode(len))
      }
      throw new IllegalArgumentException(
        "invalid brotli prefix code word")
    }
  }

  /** Bit-order reversal of a byte (stream LSB-first -> code
    * MSB-first indexing). */
  private val Rev8: Array[Int] =
    Array.tabulate(256)(i => Integer.reverse(i) >>> 24)

  // fixed code for the code-length alphabet {0..5}: lengths 2,4,3,2,2,4
  private val CodeLenCode = new PrefixCode(Array(2, 4, 3, 2, 2, 4))
  // complex-code symbol read order (RFC 7932 §3.5)
  private val CodeLenOrder =
    Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read a prefix code over `alphabetSize` symbols (§3.4-3.5). */
  private def readPrefixCode(br: BitReader, alphabetSize: Int)
      : PrefixCode = {
    val hskip = br.bits(2)
    if (hskip == 1) {
      // simple code: 1-4 explicit symbols
      val alphaBits = 32 - Integer.numberOfLeadingZeros(alphabetSize - 1)
      val nsym = br.bits(2) + 1
      val syms = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        syms(i) = br.bits(alphaBits)
        require(syms(i) < alphabetSize,
          s"simple-code symbol ${syms(i)} outside alphabet $alphabetSize")
        var j = 0
        while (j < i) {
          require(syms(j) != syms(i), "duplicate simple-code symbol")
          j += 1
        }
        i += 1
      }
      val lens: Array[Int] = nsym match {
        case 1 => Array(1)            // single symbol: zero-bit decode
        case 2 => Array(1, 1)
        case 3 => Array(1, 2, 2)
        case _ =>
          if (br.bit() == 1) Array(1, 2, 3, 3) else Array(2, 2, 2, 2)
      }
      val lengths = new Array[Int](alphabetSize)
      i = 0
      while (i < nsym) { lengths(syms(i)) = lens(i); i += 1 }
      new PrefixCode(lengths)
    } else {
      // complex code: code-length code, then symbol lengths with
      // 16/17 repeat codes (§3.5)
      val clens = new Array[Int](18)
      var space = 0
      var nonzero = 0
      var i = hskip
      while (i < 18 && space < 32) {
        val l = CodeLenCode.decode(br)
        clens(CodeLenOrder(i)) = l
        if (l > 0) { space += 32 >> l; nonzero += 1 }
        i += 1
      }
      require(space == 32 || nonzero == 1,
        s"invalid code-length code (space $space)")
      val clCode = new PrefixCode(clens) // single-nonzero = 0-bit code
      val lengths = new Array[Int](alphabetSize)
      var sym = 0
      var prevLen = 8 // kDefaultCodeLength
      var hspace = 0L
      var repeat = 0
      var repeatLen = 0
      var prevRepeat = -1 // 16 or 17 when the previous code was one
      while (sym < alphabetSize && hspace < 32768) {
        val c = clCode.decode(br)
        if (c < 16) {
          lengths(sym) = c
          sym += 1
          if (c > 0) { prevLen = c; hspace += 32768 >> c }
          prevRepeat = -1
          repeat = 0
        } else {
          val extraBits = if (c == 16) 2 else 3
          val newLen = if (c == 16) prevLen else 0
          if (prevRepeat == c && repeatLen == newLen) {
            // consecutive same repeat code: count accumulates
            val old = repeat
            repeat = ((repeat - 2) << extraBits) + 3 + br.bits(extraBits)
            val delta = repeat - old
            var k = 0
            while (k < delta) {
              require(sym < alphabetSize, "repeat overruns alphabet")
              lengths(sym) = newLen
              if (newLen > 0) hspace += 32768 >> newLen
              sym += 1
              k += 1
            }
          } else {
            repeat = 3 + br.bits(extraBits)
            repeatLen = newLen
            var k = 0
            while (k < repeat) {
              require(sym < alphabetSize, "repeat overruns alphabet")
              lengths(sym) = newLen
              if (newLen > 0) hspace += 32768 >> newLen
              sym += 1
              k += 1
            }
          }
          prevRepeat = c
        }
      }
      require(hspace == 32768,
        s"incomplete/overfull brotli prefix code (space $hspace)")
      new PrefixCode(lengths)
    }
  }

  // variable-length count code for NBLTYPES/NTREES (§9.2): 1..256
  private def readVarCount(br: BitReader): Int =
    if (br.bit() == 0) 1
    else {
      val k = br.bits(3)
      if (k == 0) 2 else (1 << k) + 1 + br.bits(k)
    }

  // block-count code (26 symbols): (base, extra bits)
  private val BlockLenBase = Array(
    1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145, 177, 209,
    241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625)
  private val BlockLenExtra = Array(
    2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8, 9,
    10, 11, 12, 13, 24)

  // insert-length code: (base, extra)
  private val InsertBase = Array(
    0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
    322, 578, 1090, 2114, 6210, 22594)
  private val InsertExtra = Array(
    0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10,
    12, 14, 24)

  // copy-length code: (base, extra)
  private val CopyBase = Array(
    2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102,
    134, 198, 326, 582, 1094, 2118)
  private val CopyExtra = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8,
    9, 10, 24)

  // command cells 2..10 (cells 0-1 use the implicit last distance):
  // high-3-bit bases of the insert / copy codes per 64-command cell
  private val CellInsert = Array(0, 0, 0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CellCopy = Array(0, 8, 0, 8, 0, 8, 16, 0, 16, 8, 16)

  /** One category's block-switching state. */
  private final class BlockState(val nTypes: Int,
      val typeCode: PrefixCode, val lenCode: PrefixCode,
      br: BitReader) {
    var btype = 0
    private var prevType = 1
    var remaining: Long =
      if (nTypes >= 2) readBlockLen(br) else Long.MaxValue

    private def readBlockLen(r: BitReader): Long = {
      val s = lenCode.decode(r)
      BlockLenBase(s).toLong + r.bits(BlockLenExtra(s))
    }

    /** Consume one element; switches block type when the count runs
      * out (§6). */
    def tick(r: BitReader): Unit = {
      if (remaining == 0) {
        val s = typeCode.decode(r)
        val next = s match {
          case 0 => prevType
          case 1 => (btype + 1) % nTypes
          case _ => s - 2
        }
        if (next >= nTypes) throw new IllegalArgumentException(
          "block type " + next + " out of range")
        prevType = btype
        btype = next
        remaining = readBlockLen(r)
      }
      remaining -= 1
    }
  }

  /** Decode a context map of `size` entries over `nTrees` values
    * (§7.3): RLE of zeros + inverse move-to-front. */
  private def readContextMap(br: BitReader, size: Int, nTrees: Int)
      : Array[Int] = {
    val rleMax = if (br.bit() == 1) br.bits(4) + 1 else 0
    val code = readPrefixCode(br, nTrees + rleMax)
    val map = new Array[Int](size)
    var i = 0
    while (i < size) {
      val s = code.decode(br)
      if (s == 0) { map(i) = 0; i += 1 }
      else if (s <= rleMax) {
        val reps = (1 << s) + br.bits(s)
        require(i + reps <= size, "context-map zero run overruns")
        i += reps // zeros
      } else {
        map(i) = s - rleMax
        i += 1
      }
    }
    if (br.bit() == 1) {
      // inverse move-to-front
      val mtf = Array.tabulate(256)(identity)
      var k = 0
      while (k < size) {
        val idx = map(k)
        val v = mtf(idx)
        var j = idx
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
        map(k) = v
        k += 1
      }
    }
    map.foreach(v => require(v < nTrees,
      s"context map references tree $v of $nTrees"))
    map
  }

  /** Decode a complete brotli stream; `maxOut` caps the output (bomb
    * guard — same discipline as the gzip/zstd walkers). */
  def decode(data: Array[Byte], maxOut: Long = 1L << 30): Array[Byte] =
    new Decoder(data, maxOut).run()

  /** One stream's decode state as CLASS FIELDS, not closure-captured
    * locals: Scala closures box captured vars (ObjectRef/IntRef), and
    * the output cursor + ring + buffer live in the per-byte hot loop —
    * the field form is what lets the JIT keep them in registers. */
  private final class Decoder(data: Array[Byte], maxOut: Long) {
    private val br = new BitReader(data)
    // WBITS (§9.1)
    private val wbits =
      if (br.bit() == 0) 16
      else {
        val n = br.bits(3)
        if (n != 0) 17 + n
        else {
          val m = br.bits(3)
          if (m == 0) 17
          else {
            // pattern 0100001: RFC-reserved, used by the non-RFC
            // large-window extension (windows past 16 MiB) — valid
            // data this decoder declines, not corruption
            if (m == 1) throw new Unsupported(
              "large-window brotli (non-RFC WBITS extension)")
            8 + m
          }
        }
      }
    private val winSize = (1L << wbits) - 16
    private var outBuf = new Array[Byte](math.max(64, data.length * 2))
    private var outLen = 0
    private def ensure(n: Int): Unit =
      if (outLen + n > outBuf.length) {
        var cap = outBuf.length
        while (cap < outLen + n) cap *= 2
        outBuf = java.util.Arrays.copyOf(outBuf, cap)
      }

    // Distance ring buffer (§4): STREAM state, persisting across
    // metablocks (the per-metablock resets are prefix codes, block
    // types, and context maps only) — pinned by multi-metablock
    // fixtures whose first distance in block 2 is short code 0
    // referencing block 1's last distance. Initialized "with 16, 15,
    // 11, 4" in INSERTION order: 4 was inserted last, so short code 0
    // ("the last distance") resolves to 4, code 1 to 11, code 2 to 15,
    // code 3 to 16 — pinned by the real-encoder fixtures in
    // BrotliDictSpec (run streams open with code 8 = last-3 = 1).
    private var d1 = 4L
    private var d2 = 11L
    private var d3 = 15L
    private var d4 = 16L

    private def decodeCompressedMetablock(r: BitReader, mlen: Long)
        : Unit = {
      // three categories of block switching
      def category(): BlockState = {
        val n = readVarCount(r)
        if (n >= 2) {
          val tc = readPrefixCode(r, n + 2)
          val lc = readPrefixCode(r, 26)
          new BlockState(n, tc, lc, r)
        } else new BlockState(1, null, null, r)
      }
      val blockL = category()
      val blockI = category()
      val blockD = category()
      val npostfix = r.bits(2)
      val ndirect = r.bits(4) << npostfix
      val contextModes = Array.fill(blockL.nTypes)(r.bits(2))
      val nTreesL = readVarCount(r)
      val cmapL =
        if (nTreesL >= 2) readContextMap(r, 64 * blockL.nTypes, nTreesL)
        else new Array[Int](64 * blockL.nTypes)
      val nTreesD = readVarCount(r)
      val cmapD =
        if (nTreesD >= 2) readContextMap(r, 4 * blockD.nTypes, nTreesD)
        else new Array[Int](4 * blockD.nTypes)
      val litCodes = Array.fill(nTreesL)(readPrefixCode(r, 256))
      // context modeling is a no-op when one block type carries one
      // tree: mode only selects WHICH tree via the (uniform) map
      val singleLitTree: PrefixCode =
        if (blockL.nTypes == 1 && nTreesL == 1) litCodes(0) else null
      val cmdCodes = Array.fill(blockI.nTypes)(readPrefixCode(r, 704))
      val distAlpha = 16 + ndirect + (48 << npostfix)
      val distCodes = Array.fill(nTreesD)(readPrefixCode(r, distAlpha))
      val ctxLut = CtxLut // force the lazy load outside the hot loop
      // distance ring buffer (§4), initial values per the RFC
      var written = 0L
      while (written < mlen) {
        blockI.tick(r)
        val cmd = cmdCodes(blockI.btype).decode(r)
        val cell = cmd >> 6
        val insCode = CellInsert(cell) + ((cmd >> 3) & 7)
        val cpyCode = CellCopy(cell) + (cmd & 7)
        val implicitDist0 = cell < 2
        val insLen = InsertBase(insCode) + r.bits(InsertExtra(insCode))
        val cpyLen = CopyBase(cpyCode).toLong +
          (if (CopyExtra(cpyCode) <= 24) r.bits(CopyExtra(cpyCode)) else 0)
        // literals
        var i = 0
        // batch the insert: one capacity/bomb check for the whole run,
        // then direct array writes — push()-per-byte dominated the
        // profile at crawl-decode rates
        if (insLen > 0) {
          ensure(insLen)
          if (outLen + insLen > maxOut) throw new Unsupported(
            s"brotli output exceeds $maxOut B — decompression bomb, refusing")
        }
        if (singleLitTree != null) {
          // the dominant stream shape (one literal block type, one
          // literal tree): no block ticking, no context modeling —
          // the specialized loop is a straight decode-and-store
          while (i < insLen) {
            outBuf(outLen) = singleLitTree.decode(r).toByte
            outLen += 1
            i += 1
          }
          written += insLen
        } else
        while (i < insLen) {
          blockL.tick(r)
          val bt = blockL.btype
          val mode = contextModes(bt)
          // §7.1: context from the last two output bytes through the
          // mode's lookup tables (LSB6/MSB6/UTF8/Signed)
          val p1 = if (outLen > 0) outBuf(outLen - 1) & 0xFF else 0
          val p2 = if (outLen > 1) outBuf(outLen - 2) & 0xFF else 0
          val ctx = (ctxLut(mode * 512 + p1) |
            ctxLut(mode * 512 + 256 + p2)) & 0xFF
          val tree = cmapL(64 * bt + ctx)
          val lit = litCodes(tree).decode(r)
          outBuf(outLen) = lit.toByte
          outLen += 1
          written += 1
          i += 1
        }
        require(written <= mlen, "brotli insert overruns MLEN")
        if (written < mlen) {
          // distance; ringEligible = a freshly-computed distance (not
          // short-code 0, not the implicit last distance) — it joins
          // the ring ONLY if it lands inside the window (§4: static
          // dictionary references never update the ring)
          var ringEligible = false
          val dist: Long =
            if (implicitDist0) d1
            else {
              blockD.tick(r)
              val dctx = math.min(cpyLen - 2, 3L).toInt
              val tree = cmapD(4 * blockD.btype + dctx)
              val sym = distCodes(tree).decode(r)
              val d: Long =
                if (sym < 16) sym match {
                  case 0 => d1
                  case 1 => d2
                  case 2 => d3
                  case 3 => d4
                  case 4 => d1 - 1
                  case 5 => d1 + 1
                  case 6 => d1 - 2
                  case 7 => d1 + 2
                  case 8 => d1 - 3
                  case 9 => d1 + 3
                  case 10 => d2 - 1
                  case 11 => d2 + 1
                  case 12 => d2 - 2
                  case 13 => d2 + 2
                  case 14 => d2 - 3
                  case _ => d2 + 3
                }
                else if (sym < 16 + ndirect) (sym - 16 + 1).toLong
                else {
                  val s = sym - 16 - ndirect
                  val postfix = s & ((1 << npostfix) - 1)
                  val h = s >> npostfix
                  val nbits = 1 + (h >> 1)
                  val offset = ((2L + (h & 1)) << nbits) - 4
                  ((offset + r.bits(nbits)) << npostfix) + postfix +
                    ndirect + 1
                }
              if (d <= 0) throw new IllegalArgumentException(
                "invalid brotli distance " + d)
              ringEligible = sym != 0
              d
            }
          val maxBack = math.min(winSize, outLen.toLong)
          if (ringEligible && dist <= maxBack) { d4 = d3; d3 = d2; d2 = d1; d1 = dist }
          if (dist <= maxBack) {
            // backward reference within the window
            require(written + cpyLen <= mlen,
              "brotli copy overruns MLEN")
            // batch the copy: one capacity/bomb check; arraycopy when
            // source and destination cannot overlap, else the
            // overlap-replicating byte loop (dist < cpyLen is the
            // run-expansion case and MUST copy forward byte-wise)
            val cl = cpyLen.toInt
            ensure(cl)
            if (outLen + cl > maxOut) throw new Unsupported(
              s"brotli output exceeds $maxOut B — decompression bomb, refusing")
            val di = dist.toInt
            if (di >= cl) {
              System.arraycopy(outBuf, outLen - di, outBuf, outLen, cl)
              outLen += cl
            } else {
              var k = 0
              while (k < cl) {
                outBuf(outLen) = outBuf(outLen - di)
                outLen += 1
                k += 1
              }
            }
            written += cpyLen
          } else {
            // static dictionary reference (§8): word id encodes the
            // word index (low SIZE_BITS bits) and the transform id
            if (cpyLen < 4 || cpyLen > 24)
              throw new IllegalArgumentException(
                "static-dictionary copy length " + cpyLen +
                  " outside 4..24")
            val cl = cpyLen.toInt
            val lenBits = DictSizeBits(cl)
            val wordId = dist - maxBack - 1
            val index = (wordId & ((1L << lenBits) - 1)).toInt
            val tid = (wordId >> lenBits).toInt
            if (tid >= 121) throw new IllegalArgumentException(
              "static-dictionary transform " + tid + " out of range")
            val word = transformWord(DictOffsets(cl) + index * cl, cl, tid)
            require(written + word.length <= mlen,
              "brotli dictionary word overruns MLEN")
            ensure(word.length)
            if (outLen + word.length > maxOut) throw new Unsupported(
              s"brotli output exceeds $maxOut B — decompression bomb, refusing")
            System.arraycopy(word, 0, outBuf, outLen, word.length)
            outLen += word.length
            written += word.length
          }
        }
      }
    }

    def run(): Array[Byte] = {
    var isLast = false
    while (!isLast) {
      isLast = br.bit() == 1
      if (isLast && br.bit() == 1) {
        // ISLASTEMPTY
      } else {
        val mnibblesCode = br.bits(2)
        if (mnibblesCode == 3) {
          // metadata block (§9.2): skipped, byte-aligned
          require(br.bit() == 0, "reserved metadata bit set")
          val mskipBytes = br.bits(2)
          var mskip = 0
          var k = 0
          while (k < mskipBytes) { mskip |= br.bits(8) << (8 * k); k += 1 }
          if (mskipBytes > 0)
            require((mskip >> (8 * (mskipBytes - 1))) != 0,
              "metadata length has a zero high byte")
          val len = if (mskipBytes == 0) 0 else mskip + 1
          br.alignByte()
          br.skipBytes(len)
        } else {
          val mnibbles = 4 + mnibblesCode
          var mlen = 0L
          var k = 0
          while (k < mnibbles) { mlen |= br.bits(4).toLong << (4 * k); k += 1 }
          if (mnibbles > 4)
            require((mlen >> (4 * (mnibbles - 1))) != 0,
              "MLEN high nibble zero with extended MNIBBLES")
          mlen += 1
          val uncompressed = !isLast && br.bit() == 1
          if (uncompressed) {
            br.alignByte()
            if (outLen + mlen > maxOut) throw new Unsupported(
              s"brotli output exceeds $maxOut B — decompression bomb, refusing")
            ensure(mlen.toInt)
            val start = br.byteOffset
            require(start + mlen <= data.length,
              "uncompressed metablock truncated")
            System.arraycopy(data, start, outBuf, outLen, mlen.toInt)
            outLen += mlen.toInt
            br.skipBytes(mlen.toInt)
          } else {
            decodeCompressedMetablock(br, mlen)
          }
        }
      }
    }
    java.util.Arrays.copyOf(outBuf, outLen)
    }
  }

  // -------------------------------------------------------------------------
  // minimal encoder — uncompressed metablocks only (every byte
  // sequence is representable; the wire form is trivially conformant:
  // WBITS, then per chunk ISLAST=0 + MNIBBLES + MLEN-1 + ISUNCOMPRESSED,
  // byte-aligned raw bytes, then an ISLAST+ISLASTEMPTY terminator).
  // Enough to synthesize `br` fixture pages; the decoder's compressed
  // paths are pinned by hand-assembled golden vectors instead.
  // -------------------------------------------------------------------------

  def encodeUncompressed(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 16)
    var acc = 0
    var nb = 0
    def putBits(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) {
        acc |= (((v >> i) & 1L) << nb).toInt
        nb += 1
        if (nb == 8) { out.write(acc); acc = 0; nb = 0 }
        i += 1
      }
    }
    def align(): Unit = if (nb != 0) { out.write(acc); acc = 0; nb = 0 }
    putBits(0, 1) // WBITS = 16
    var off = 0
    while (off < body.length) {
      val n = math.min(1 << 16, body.length - off)
      putBits(0, 1)               // ISLAST = 0
      putBits(0, 2)               // MNIBBLES code 0 -> 4 nibbles
      putBits(n.toLong - 1, 16)   // MLEN - 1
      putBits(1, 1)               // ISUNCOMPRESSED
      align()
      out.write(body, off, n)
      off += n
    }
    putBits(1, 1) // ISLAST
    putBits(1, 1) // ISLASTEMPTY
    align()
    out.toByteArray
  }

  /** Valid RFC 7932 stream whose FIRST metablock is a §8
    * static-dictionary reference — word 0 ("time") through Appendix B
    * transform 4 (ferment-first + " " suffix), decoding to "Time " —
    * followed by `body` in uncompressed metablocks. The synthetic
    * crawls use it so every scan of a `br` page exercises the
    * dictionary machinery against a closed-form oracle
    * (md5('Time ' || page)). Wire documented bit by bit because the
    * golden fixtures decode it against pinned output. */
  def encodeWithDictPrefix(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 32)
    var acc = 0
    var nb = 0
    def putBits(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) {
        acc |= (((v >> i) & 1L) << nb).toInt
        nb += 1
        if (nb == 8) { out.write(acc); acc = 0; nb = 0 }
        i += 1
      }
    }
    def putCode(c: Long, n: Int): Unit = { // prefix codes: MSB first
      var k = n - 1
      while (k >= 0) { putBits((c >> k) & 1L, 1); k -= 1 }
    }
    def align(): Unit = if (nb != 0) { out.write(acc); acc = 0; nb = 0 }
    putBits(0, 1)      // WBITS = 16
    // metablock 1: compressed, MLEN 5 ("Time ")
    putBits(0, 1)      // ISLAST = 0
    putBits(0, 2)      // MNIBBLES code 0 -> 4 nibbles
    putBits(4, 16)     // MLEN - 1 = 4
    putBits(0, 1)      // ISUNCOMPRESSED = 0
    putBits(0, 1); putBits(0, 1); putBits(0, 1) // NBLTYPES L/I/D = 1
    putBits(0, 2)      // NPOSTFIX = 0
    putBits(0, 4)      // NDIRECT = 0
    putBits(0, 2)      // literal context mode LSB6
    putBits(0, 1)      // NTREESL = 1
    putBits(0, 1)      // NTREESD = 1
    // literal code: simple, 1 symbol ('x', unused) — zero-bit decode
    putBits(1, 2); putBits(0, 2); putBits('x', 8)
    // command code: simple, 1 symbol 130 (insert 0, copy 4, explicit)
    putBits(1, 2); putBits(0, 2); putBits(130, 10)
    // distance code: simple, 1 symbol 36 (offset 4092, 11 extra bits)
    putBits(1, 2); putBits(0, 2); putBits(36, 6)
    // the one command: zero-bit cmd + distance symbols; 11 extra bits
    // of value 4 -> d = 4092 + 4 + 1 = 4097 at 0 written bytes ->
    // word id 4096 = transform 4, word-0 of length 4
    putBits(4, 11)
    putCode(0, 0)      // (no bits: single-symbol codes)
    // body in uncompressed metablocks
    var off = 0
    while (off < body.length) {
      val n = math.min(1 << 16, body.length - off)
      putBits(0, 1)               // ISLAST = 0
      putBits(0, 2)               // MNIBBLES code 0 -> 4 nibbles
      putBits(n.toLong - 1, 16)   // MLEN - 1
      putBits(1, 1)               // ISUNCOMPRESSED
      align()
      out.write(body, off, n)
      off += n
    }
    putBits(1, 1) // ISLAST
    putBits(1, 1) // ISLASTEMPTY
    align()
    out.toByteArray
  }
}
