package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BrotliCodec

/** Golden brotli byte vectors assembled BY HAND from RFC 7932 — never
  * through [[BrotliCodec]]'s own encoder — and decoded to pinned
  * output (the FlacGoldenSpec pattern: a self-consistent-but-wrong
  * codec pair passes a round-trip and fails here). Covers the WBITS
  * header, uncompressed metablocks, metadata-skip blocks, simple
  * prefix codes (1/2/4-symbol incl. the zero-bit single-symbol form),
  * a COMPLEX prefix code with 17-repeat zero runs and their
  * accumulation rule, insert+copy commands with extra bits, the
  * distance ring buffer (initial values AND post-update short codes),
  * and MLEN-exhausting insert commands whose copy part is skipped. */
object BrotliGoldenSpec {

  // ---- test-local LSB-first bit writer (the brotli bit order) ----
  private[graft] final class BW {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def bit(b: Int): Unit = {
      acc |= (b & 1) << n
      n += 1
      if (n == 8) { out.write(acc); acc = 0; n = 0 }
    }
    /** Multi-bit field, LSB first (how brotli packs values). */
    def bits(v: Long, w: Int): Unit = {
      var i = 0
      while (i < w) { bit(((v >> i) & 1L).toInt); i += 1 }
    }
    /** Prefix-code word: MSB-of-code-first (tree descent order). */
    def code(c: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { bit((c >> k) & 1); k -= 1 }
    }
    def align(): Unit = while (n != 0) bit(0)
    def raw(b: Array[Byte]): Unit = {
      require(n == 0, "unaligned raw write")
      out.write(b, 0, b.length)
    }
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  /** Simple prefix code header (§3.4): HSKIP=1, NSYM, symbols. */
  private[graft] def simpleCode(w: BW, alphabetSize: Int, syms: Int*)
      : Unit = {
    val alphaBits = 32 - Integer.numberOfLeadingZeros(alphabetSize - 1)
    w.bits(1, 2)                    // HSKIP = 1
    w.bits(syms.length - 1L, 2)     // NSYM - 1
    syms.foreach(s => w.bits(s.toLong, alphaBits))
    // callers add the tree-select bit themselves for NSYM == 4
  }

  /** Scaffold: WBITS=16, single LAST compressed metablock of `mlen`
    * bytes, one block type everywhere, NPOSTFIX=NDIRECT=0, LSB6
    * context mode, one literal tree and one distance tree. The caller
    * writes the literal/command/distance codes and the command data. */
  private[graft] def scaffold(w: BW, mlen: Int): Unit = {
    w.bit(0)              // WBITS = 16
    w.bit(1)              // ISLAST
    w.bit(0)              // not ISLASTEMPTY
    w.bits(0, 2)          // MNIBBLES code 0 -> 4 nibbles
    w.bits(mlen.toLong - 1, 16)
    w.bit(0); w.bit(0); w.bit(0) // NBLTYPES L/I/D = 1
    w.bits(0, 2)          // NPOSTFIX
    w.bits(0, 4)          // NDIRECT
    w.bits(0, 2)          // context mode: LSB6
    w.bit(0)              // NTREESL = 1
    w.bit(0)              // NTREESD = 1
  }

  /** §8 static-dictionary reference wire: one copy-4 command whose
    * explicit distance 1 at zero written bytes addresses word id 0 —
    * the appendix dictionary's first 4-byte word, identity transform. */
  private[graft] def wireWithDictRef(): Array[Byte] = {
    val w = new BW
    scaffold(w, 4)
    simpleCode(w, 256, 'x')       // literal tree (unused)
    simpleCode(w, 704, 130)       // insert 0, copy 4, explicit distance
    simpleCode(w, 64, 16)         // distance symbol 16: d = 1 + extra
    w.bit(0)                      // extra bit 0 -> d = 1
    w.bytes
  }
}

class BrotliGoldenSpec extends AnyFunSuite {
  import BrotliGoldenSpec._

  test("golden 1: uncompressed metablock + empty-last terminator " +
      "round the raw bytes through (hand-assembled wire form)") {
    val body = "the quick brown fox".getBytes("US-ASCII")
    val w = new BW
    w.bit(0)                        // WBITS = 16
    w.bit(0)                        // ISLAST = 0
    w.bits(0, 2)                    // MNIBBLES code 0
    w.bits(body.length.toLong - 1, 16)
    w.bit(1)                        // ISUNCOMPRESSED
    w.align()
    w.raw(body)
    w.bit(1); w.bit(1)              // ISLAST + ISLASTEMPTY
    assert(BrotliCodec.decode(w.bytes).toSeq == body.toSeq)
  }

  test("golden 2: metadata block is skipped byte-exactly before a " +
      "compressed literal-only metablock (simple 2-symbol code)") {
    val w = new BW
    w.bit(0)                        // WBITS = 16
    // metadata block: ISLAST=0, MNIBBLES code 3, 3 skip bytes
    w.bit(0)
    w.bits(3, 2)
    w.bit(0)                        // reserved
    w.bits(1, 2)                    // MSKIPBYTES = 1
    w.bits(2, 8)                    // MSKIPLEN - 1 = 2 -> skip 3 bytes
    w.align()
    w.raw(Array[Byte](0x55, 0x66, 0x77))
    // LAST compressed metablock: "ababab"
    w.bit(1)                        // ISLAST
    w.bit(0)
    w.bits(0, 2)
    w.bits(5, 16)                   // MLEN = 6
    w.bit(0); w.bit(0); w.bit(0)    // one block type per category
    w.bits(0, 2); w.bits(0, 4)      // NPOSTFIX, NDIRECT
    w.bits(0, 2)                    // LSB6
    w.bit(0); w.bit(0)              // NTREESL = NTREESD = 1
    simpleCode(w, 256, 'a', 'b')    // literal code: a->0, b->1
    // command code: single symbol 48 = cell 0 (implicit distance),
    // insert code 6 (base 6 + 1 extra bit), copy code 0
    simpleCode(w, 704, 48)
    simpleCode(w, 64, 0)            // distance code (never used)
    // data: command (0 bits), insert extra bit 0 -> insert len 6,
    // then 6 literals; MLEN reached -> copy skipped
    w.bit(0)                        // insert extra
    for (_ <- 0 until 3) { w.code(0, 1); w.code(1, 1) } // a b
    assert(new String(BrotliCodec.decode(w.bytes), "US-ASCII") ==
      "ababab")
  }

  test("golden 3: insert+copy commands with the distance ring — " +
      "initial LAST distance 4 via short code 0 (\"16, 15, 11, 4\" in " +
      "insertion order, §4), then last-2 via short code 6") {
    val w = new BW
    scaffold(w, 13)
    // literal code: 4 symbols a,b,c,d at 2 bits each (tree-select 0)
    simpleCode(w, 256, 'a', 'b', 'c', 'd')
    w.bit(0)                        // tree-select: 2,2,2,2
    // command code: {138, 162} at 1 bit (canonical: 138->0, 162->1)
    //   162 = 128 + 4*8 + 2: explicit, insert code 4, copy code 2
    //   138 = 128 + 1*8 + 2: explicit, insert code 1, copy code 2
    simpleCode(w, 704, 138, 162)
    // distance code: {0, 6} at 1 bit (0 -> last = initial 4, no ring
    // update; 6 -> last - 2)
    simpleCode(w, 64, 0, 6)
    // cmd 162: insert "abcd" (code 4, 0 extra), copy 4 (code 2, 0
    // extra) at distance 4 -> "abcdabcd"
    w.code(1, 1)                    // command 162
    w.code(0, 2); w.code(1, 2); w.code(2, 2); w.code(3, 2) // a b c d
    w.code(0, 1)                    // distance symbol 0 (last = 4)
    // cmd 138: insert "a", copy 4 at distance last-2 = 2 ->
    // "abcdabcda" + "dada"
    w.code(0, 1)                    // command 138
    w.code(0, 2)                    // literal a
    w.code(1, 1)                    // distance symbol 6 (last - 2 = 2)
    assert(new String(BrotliCodec.decode(w.bytes), "US-ASCII") ==
      "abcdabcdadada")
  }

  test("golden 4: a COMPLEX literal prefix code — 17-repeat zero " +
      "runs with the accumulation rule (3 -> 13 -> 97 zeros), then " +
      "lengths 1/2/3/3 — decodes 'abacbdcdba'") {
    val w = new BW
    scaffold(w, 10)
    // complex literal code over {a:1, b:2, c:3, d:3}
    w.bits(0, 2) // HSKIP = 0
    // fixed code-length-code words: value -> (code, len)
    val fixed = Map(0 -> (0, 2), 1 -> (14, 4), 2 -> (6, 3),
      3 -> (1, 2), 4 -> (2, 2), 5 -> (15, 4))
    def clc(v: Int): Unit = { val (c, l) = fixed(v); w.code(c, l) }
    // code-length-code lengths, in read order 1,2,3,4,0,5,17:
    // {1:2, 2:2, 3:2, 4:0, 0:3, 5:0, 17:3} -> space 32, reading stops
    clc(2); clc(2); clc(2); clc(0); clc(3); clc(0); clc(3)
    // canonical code-length code: len2 {1,2,3} -> 00,01,10;
    // len3 {0,17} -> 110,111
    def sym(s: Int): Unit = s match {
      case 1 => w.code(0, 2)
      case 2 => w.code(1, 2)
      case 3 => w.code(2, 2)
      case 0 => w.code(6, 3)
      case 17 => w.code(7, 3)
      case other => fail(s"unexpected $other")
    }
    // 97 zeros via accumulating 17s: 3 -> (3-2)*8+3+2=13 ->
    // (13-2)*8+3+6=97
    sym(17); w.bits(0, 3)
    sym(17); w.bits(2, 3)
    sym(17); w.bits(6, 3)
    // lengths for 'a'(97)=1, 'b'=2, 'c'=3, 'd'=3 -> space full, stop
    sym(1); sym(2); sym(3); sym(3)
    // command code: single symbol 256 = 256 + (8-8)*8 + 0:
    // explicit cell (insert codes 8-15), insert code 8 (base 10,
    // 2 extra), copy code 0 — copy skipped at MLEN
    simpleCode(w, 704, 256)
    simpleCode(w, 64, 0)
    // data: command (0 bits), insert extra 2 bits = 0 -> insert 10
    w.bits(0, 2)
    // literals, canonical: a=0(1), b=10(2), c=110(3), d=111(3)
    def lit(ch: Char): Unit = ch match {
      case 'a' => w.code(0, 1)
      case 'b' => w.code(2, 2)
      case 'c' => w.code(6, 3)
      case 'd' => w.code(7, 3)
    }
    "abacbdcdba".foreach(lit)
    assert(new String(BrotliCodec.decode(w.bytes), "US-ASCII") ==
      "abacbdcdba")
  }

  test("the encoder's uncompressed-metablock form round-trips " +
      "arbitrary bytes, including multi-chunk bodies") {
    val rnd = new scala.util.Random(4242)
    for (n <- Seq(0, 1, 7, 255, 65536, 65537, 200000)) {
      val body = new Array[Byte](n)
      rnd.nextBytes(body)
      val dec = BrotliCodec.decode(BrotliCodec.encodeUncompressed(body))
      assert(java.util.Arrays.equals(dec, body), s"roundtrip n=$n")
    }
  }

  test("invalid static-dictionary references REJECT with clear " +
      "messages; corrupt streams never loop or allocate unbounded") {
    // transform id past 120: distance symbol 56 (nbits 21, offset
    // 4194300) at zero written bytes -> word id 4194300, transform
    // 4095 — invalid per §8
    val w = new BW
    scaffold(w, 8)
    simpleCode(w, 256, 'x')
    // command 130 = 2*64 + 0*8 + 2: insert 0, copy 4, explicit
    simpleCode(w, 704, 130)
    simpleCode(w, 64, 56)
    w.bits(0, 21) // extra bits -> d = 4194301
    val ex = intercept[IllegalArgumentException] {
      BrotliCodec.decode(w.bytes)
    }
    assert(ex.getMessage.contains("transform"), ex.getMessage)
    // dictionary-range distance with a copy length no dictionary
    // word has (30) is likewise invalid
    val w2 = new BW
    scaffold(w2, 32)
    simpleCode(w2, 256, 'x')
    // command 197 = 3*64 + 0*8 + 5: insert 0, copy code 13 (base 30)
    simpleCode(w2, 704, 197)
    simpleCode(w2, 64, 16)
    w2.bits(0, 3) // copy extra: 30
    w2.bit(0)     // distance extra -> d = 1 > 0 written
    val ex2 = intercept[IllegalArgumentException] {
      BrotliCodec.decode(w2.bytes)
    }
    assert(ex2.getMessage.contains("4..24"), ex2.getMessage)
    // fuzz: random bytes either decode or reject — never hang/OOM
    val rnd = new scala.util.Random(99)
    var rejected = 0
    for (_ <- 0 until 300) {
      val b = new Array[Byte](1 + rnd.nextInt(64))
      rnd.nextBytes(b)
      try BrotliCodec.decode(b, maxOut = 1 << 20)
      catch { case _: Exception => rejected += 1 }
    }
    assert(rejected > 0)
  }
}
