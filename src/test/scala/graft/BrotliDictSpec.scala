package graft

import graft.operators.BrotliCodec
import org.scalatest.funsuite.AnyFunSuite

/** Static-dictionary + full-context-mode validation of the clean-room
  * RFC 7932 decoder against a REAL encoder's output: the fixtures under
  * resources/brotli/fuzz were produced by an independent brotli
  * implementation (brotlicffi, see tools/gen_brotli_fixtures.py) at
  * qualities 1-11 over payload families chosen to exercise the
  * Appendix A dictionary, all 121 Appendix B transforms reachable by
  * the encoder, the §7.1 UTF8/Signed context modes, and small-window
  * streams whose distances straddle the window/dictionary boundary.
  * A decoder bug in any of those — word indexing, transform table,
  * ferment rules, ring-update-on-dictionary semantics, context LUT —
  * breaks at least one round-trip here. */
class BrotliDictSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    assert(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  private val stems = {
    val m = new String(res("/brotli/fuzz/manifest.json"), "UTF-8")
    "\"stem\": \"(\\d+)\"".r.findAllMatchIn(m).map(_.group(1)).toSeq
  }

  test("all real-encoder fixtures round-trip byte-exactly " +
      "(dictionary references, transforms, UTF8/Signed contexts)") {
    assert(stems.size == 80, s"expected 80 fixtures, found ${stems.size}")
    for (s <- stems) {
      val raw = res(s"/brotli/fuzz/$s.raw")
      val br = res(s"/brotli/fuzz/$s.br")
      val dec = BrotliCodec.decode(br)
      assert(java.util.Arrays.equals(dec, raw),
        s"fixture $s: ${dec.length} B decoded vs ${raw.length} B raw")
    }
  }

  test("a hand-assembled §8 reference decodes the first dictionary " +
      "word with the identity transform") {
    // distance = maxBack + 1 + wordId at zero written bytes: copy
    // length 4, wordId 0 -> the dictionary's first 4-byte word "time"
    // (RFC 7932 appendix A layout pinned in the extractor)
    val w = BrotliGoldenSpec.wireWithDictRef()
    assert(new String(BrotliCodec.decode(w), "UTF-8") == "time")
  }

  test("valid-but-out-of-subset streams throw Unsupported (degrade " +
      "signal), corrupt streams throw IllegalArgumentException") {
    // large-window WBITS pattern 0100001 (reserved in the RFC, used by
    // the large-window extension): first bits 1, then 000, then 001
    val lw = Array[Byte]((1 | (0 << 1) | (1 << 4)).toByte, 0, 0)
    intercept[BrotliCodec.Unsupported] { BrotliCodec.decode(lw) }
    // bomb cap: tiny cap over a real stream
    val big = res("/brotli/fuzz/003.br") // a 20 kB-class payload
    intercept[BrotliCodec.Unsupported] {
      BrotliCodec.decode(big, maxOut = 16)
    }
    // corruption stays IllegalArgumentException
    intercept[IllegalArgumentException] {
      BrotliCodec.decode(Array[Byte](0x21, 0x7F, 0x7F, 0x7F))
    }
  }
}
