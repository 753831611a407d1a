package graft.pcap

import org.scalatest.funsuite.AnyFunSuite

/** TCP option-region decode (tcp_mss / tcp_wscale / tcp_sack_ok /
  * tcp_ts_ok — the p0f-style SYN fingerprint surface; superset columns,
  * the reference stops at ports). Contract under test: options parse
  * only when the WHOLE option region was captured and well-formed;
  * otherwise all four columns stay NULL — absence of evidence is never
  * reported as "option absent". */
class TcpOptionsSpec extends AnyFunSuite {

  private val a = Array[Byte](10, 0, 0, 1)
  private val b = Array[Byte](10, 0, 0, 2)

  private def synWith(opts: Array[Byte]): Array[Byte] =
    PcapSynth.ipv4TcpFrame(a, b, 1111, 443, ttl = 64,
      payload = Array.emptyByteArray, seq = 1, flags = 0x02,
      window = 64240, tcpOpts = opts)

  private def decodeOne(frame: Array[Byte]): PacketRecord = {
    val r = new PcapStreamReader(new java.io.ByteArrayInputStream(
      PcapSynth.file(Seq((1L, 0L, frame)))), DecodeOptions())
    r.next()
  }

  test("classic Linux SYN stack: MSS, SACK-perm, TS, NOP, WScale") {
    val r = decodeOne(synWith(Array[Byte](2, 4, 5, 0xB4.toByte, 4, 2,
      8, 10, 0, 0, 0, 1, 0, 0, 0, 9, 1, 3, 3, 7)))
    assert(r.tcpMss.contains(1460))
    assert(r.tcpWscale.contains(7))
    assert(r.tcpSackOk.contains(true))
    assert(r.tcpTsOk.contains(true))
  }

  test("bare header (data offset 5): mss/wscale NULL, flags false") {
    val r = decodeOne(synWith(Array.emptyByteArray))
    assert(r.tcpMss.isEmpty && r.tcpWscale.isEmpty)
    assert(r.tcpSackOk.contains(false))
    assert(r.tcpTsOk.contains(false))
  }

  test("EOL terminates the walk; options before it still count") {
    // MSS, SACK-perm, EOL, then garbage padding that must be ignored
    val r = decodeOne(synWith(Array[Byte](2, 4, 5, 0xB4.toByte, 4, 2,
      0, 0x7F, 0x7F, 0x7F, 0x7F, 0x7F)))
    assert(r.tcpMss.contains(1460))
    assert(r.tcpSackOk.contains(true))
    assert(r.tcpTsOk.contains(false))
    assert(r.tcpWscale.isEmpty)
  }

  test("unknown option kinds are skipped by their length") {
    // kind 254 (experimental) len 6, then WScale 9
    val r = decodeOne(synWith(Array[Byte](0xFE.toByte, 6, 1, 2, 3, 4,
      1, 3, 3, 9, 1, 1)))
    assert(r.tcpWscale.contains(9))
    assert(r.tcpSackOk.contains(false))
  }

  test("malformed option length poisons the whole region to NULL") {
    // MSS parses first, then an option with len 1 (< 2) — the walk
    // aborts and the already-seen MSS must NOT survive
    val r = decodeOne(synWith(Array[Byte](2, 4, 5, 0xB4.toByte,
      5, 1, 0, 0, 0, 0, 0, 0)))
    assert(r.tcpMss.isEmpty && r.tcpWscale.isEmpty)
    assert(r.tcpSackOk.isEmpty && r.tcpTsOk.isEmpty)
  }

  test("option length running past the data offset poisons to NULL") {
    val r = decodeOne(synWith(Array[Byte](2, 4, 5, 0xB4.toByte,
      3, 3, 7, 8, 10, 0, 0, 0)))   // TS claims 10 bytes, only 4 remain
    assert(r.tcpMss.isEmpty && r.tcpWscale.isEmpty)
    assert(r.tcpSackOk.isEmpty && r.tcpTsOk.isEmpty)
  }

  test("truncated capture (snap inside the option region) leaves NULLs") {
    val full = synWith(Array[Byte](2, 4, 5, 0xB4.toByte, 4, 2,
      8, 10, 0, 0, 0, 1, 0, 0, 0, 9, 1, 3, 3, 7))
    // cut 8 bytes into the option region: header claims data offset 10
    // words but the capture ends early
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 12)
    val r = decodeOne(cut)
    assert(r.tcpMss.isEmpty && r.tcpWscale.isEmpty)
    assert(r.tcpSackOk.isEmpty && r.tcpTsOk.isEmpty)
    // the fixed header still decoded
    assert(r.tcpWindow.contains(64240))
    assert(r.tcpFlags.contains("SYN"))
  }

  test("non-TCP packets never populate the option columns") {
    val r = decodeOne(PcapSynth.ipv4UdpFrame(a, b, 53, 53, 64,
      new Array[Byte](8)))
    assert(r.tcpMss.isEmpty && r.tcpWscale.isEmpty)
    assert(r.tcpSackOk.isEmpty && r.tcpTsOk.isEmpty)
  }
}
