package graft.pcap

import java.io.ByteArrayInputStream
import java.io.IOException

import org.scalatest.funsuite.AnyFunSuite

/** Unit vectors ported from the reference tests (SURVEY.md §5,
  * FIXTURES.md §3): PcapReaderTest.java link-type / IP-offset / payload
  * cases, plus the robustness contract of §1.3. */
class PcapCoreSpec extends AnyFunSuite {
  import PcapStreamReader._

  // -- IP offset discovery (PcapReaderTest.java:53-108) --------------------

  test("ip start: NULL/RAW at 0, LOOP at 4") {
    assert(ipStart(0, new Array[Byte](64)).contains(0))
    assert(ipStart(101, new Array[Byte](64)).contains(0))
    assert(ipStart(108, new Array[Byte](64)).contains(4))
  }

  private def etherFrame(etherType: Int, vlanInner: Option[Int] = None): Array[Byte] = {
    val f = new Array[Byte](64)
    f(12) = ((etherType >> 8) & 0xFF).toByte
    f(13) = (etherType & 0xFF).toByte
    vlanInner.foreach { inner =>
      f(16) = ((inner >> 8) & 0xFF).toByte
      f(17) = (inner & 0xFF).toByte
    }
    f
  }

  test("ip start: EN10MB ipv4 at 14") {
    assert(ipStart(1, etherFrame(0x0800)).contains(14))
  }

  test("ip start: EN10MB 802.1Q + ipv4 at 18") {
    assert(ipStart(1, etherFrame(0x8100, Some(0x0800))).contains(18))
  }

  test("ip start: unknown ethertype -> none") {
    assert(ipStart(1, etherFrame(0xFFFF)).isEmpty)
  }

  test("ether type names (PcapReader.java:257-281)") {
    assert(etherTypeName(1, etherFrame(0x0800)) == "IPv4")
    assert(etherTypeName(1, etherFrame(0x0806)) == "arp")
    assert(etherTypeName(1, etherFrame(0x8035)) == "rarp")
    assert(etherTypeName(1, etherFrame(0x86DD)) == "IPv6")
    assert(etherTypeName(1, etherFrame(0x8100)) == "vlan")
    assert(etherTypeName(1, etherFrame(0xABCD)) == "0xabcd")
    assert(etherTypeName(0, new Array[Byte](64)) == "")
  }

  // -- container robustness (SURVEY.md §1.3) -------------------------------

  test("empty stream yields zero packets, no error") {
    val r = new PcapStreamReader(new ByteArrayInputStream(Array.emptyByteArray))
    assert(!r.hasNext)
  }

  test("bad magic throws") {
    val junk = Array.fill[Byte](24)(0x42)
    assertThrows[IOException] {
      new PcapStreamReader(new ByteArrayInputStream(junk))
    }
  }

  // -- container-variant auto-detection (extension beyond the reference,
  // which accepts LE-microsecond files only) -------------------------------

  private def udpPkt(i: Int): Array[Byte] = PcapSynth.ipv4UdpFrame(
    Array[Byte](10, 0, 0, i.toByte), Array[Byte](10, 0, 0, 99),
    1000 + i, 2000, ttl = 64, payload = new Array[Byte](8))

  test("big-endian pcap decodes identically to little-endian") {
    val pkts = (1 to 3).map(i => (1700000000L + i, 500000L + i, udpPkt(i)))
    val le = new PcapStreamReader(
      new ByteArrayInputStream(PcapSynth.file(pkts)), DecodeOptions()).toList
    val be = new PcapStreamReader(
      new ByteArrayInputStream(PcapSynth.fileBe(pkts)), DecodeOptions()).toList
    assert(le == be)
    assert(be.map(_.tsMicro.get) ==
      pkts.map { case (s, u, _) => s * 1000000L + u })
  }

  test("nanosecond pcap truncates sub-second stamps to micros") {
    val pkts = Seq((1700000000L, 123456789L, udpPkt(1)))
    val nano = new PcapStreamReader(
      new ByteArrayInputStream(PcapSynth.fileNano(pkts)), DecodeOptions()).toList
    assert(nano.head.tsMicro.contains(1700000000L * 1000000L + 123456L))
    val beNano = new PcapStreamReader(
      new ByteArrayInputStream(PcapSynth.fileBe(pkts, nano = true)),
      DecodeOptions()).toList
    assert(beNano == nano)
  }

  test("unsupported link type throws") {
    val hdr = PcapSynth.globalHeader(linkType = 42)
    assertThrows[IOException] {
      new PcapStreamReader(new ByteArrayInputStream(hdr))
    }
  }

  test("truncated packet body yields ts-only record") {
    val bytes = PcapSynth.globalHeader() ++
      PcapSynth.packetHeader(100L, 7L, 500) ++ Array.fill[Byte](10)(1)
    val r = new PcapStreamReader(new ByteArrayInputStream(bytes))
    val rec = r.next()
    assert(rec.ts.contains(100L))
    assert(rec.tsMicro.contains(100000007L))
    assert(rec.size.isEmpty && rec.etherType.isEmpty)
    assert(!r.hasNext)
  }

  test("non-IP frame: ts, size, ether_type only") {
    val frame = etherFrame(0x0806) // ARP
    val bytes = PcapSynth.file(Seq((5L, 0L, frame)))
    val r = new PcapStreamReader(new ByteArrayInputStream(bytes))
    val rec = r.next()
    assert(rec.ts.contains(5L))
    assert(rec.size.contains(frame.length.toLong))
    assert(rec.etherType.contains("arp"))
    assert(rec.src.isEmpty && rec.protocol.isEmpty)
  }

  // -- v4/v6 decode on synthesized frames ----------------------------------

  test("ipv4 udp frame decodes ports, ttl, addresses, payload len") {
    val frame = PcapSynth.ipv4UdpFrame(
      src = Array(10, 0, 0, 1).map(_.toByte),
      dst = Array(10, 0, 0, 2).map(_.toByte),
      srcPort = 1234, dstPort = 53, ttl = 17,
      payload = "hello".getBytes)
    val r = new PcapStreamReader(
      new ByteArrayInputStream(PcapSynth.file(Seq((9L, 1L, frame)))))
    val rec = r.next()
    assert(rec.etherType.contains("IPv4"))
    assert(rec.protocol.contains("UDP"))
    assert(rec.ttl.contains(17))
    assert(rec.src.contains("10.0.0.1"))
    assert(rec.dst.contains("10.0.0.2"))
    assert(rec.srcPort.contains(1234))
    assert(rec.dstPort.contains(53))
    assert(rec.len.contains(5))
    assert(rec.frag.isEmpty && rec.extCount.isEmpty)
  }

  test("ipv6 with fragment ext header sets frag, walks chain") {
    val frame = PcapSynth.ipv6UdpFrame(
      srcPort = 4000, dstPort = 53, hopLimit = 64,
      payload = "abcdef".getBytes, withFragmentHeader = true)
    val r = new PcapStreamReader(
      new ByteArrayInputStream(PcapSynth.file(Seq((9L, 1L, frame)))))
    val rec = r.next()
    assert(rec.etherType.contains("IPv6"))
    assert(rec.protocol.contains("UDP"))
    assert(rec.frag.contains(true))
    assert(rec.extCount.contains(1))
    assert(rec.extHeaders.contains("[Fragment][UDP]"))
    assert(rec.srcPort.contains(4000))
    assert(rec.len.contains(6))
  }

  test("udp checksum residual: zero for valid, absent when field is 0") {
    val valid = PcapSynth.ipv4UdpFrame(
      src = Array(1, 2, 3, 4).map(_.toByte),
      dst = Array(5, 6, 7, 8).map(_.toByte),
      srcPort = 1, dstPort = 2, ttl = 3,
      payload = "xy".getBytes, withChecksum = true)
    val r1 = new PcapStreamReader(
      new ByteArrayInputStream(PcapSynth.file(Seq((1L, 0L, valid)))))
    assert(r1.next().udpsum.contains(0))

    val noCk = PcapSynth.ipv4UdpFrame(
      src = Array(1, 2, 3, 4).map(_.toByte),
      dst = Array(5, 6, 7, 8).map(_.toByte),
      srcPort = 1, dstPort = 2, ttl = 3,
      payload = "xy".getBytes, withChecksum = false)
    val r2 = new PcapStreamReader(
      new ByteArrayInputStream(PcapSynth.file(Seq((1L, 0L, noCk)))))
    assert(r2.next().udpsum.isEmpty)
  }

  test("md5 option computes uppercase frame digest") {
    val frame = etherFrame(0x0806)
    val r = new PcapStreamReader(
      new ByteArrayInputStream(PcapSynth.file(Seq((1L, 0L, frame)))),
      DecodeOptions(md5 = true))
    val got = r.next().md5.get
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(frame).map(b => f"${b & 0xFF}%02X").mkString
    assert(got == expect && got == got.toUpperCase)
  }

  // -- additional §7.5 quirk coverage --------------------------------------

  test("QinQ (double VLAN) falls through to no IP decode") {
    // outer 0x8100, inner also 0x8100 — reference unwraps only one tag
    val f = etherFrame(0x8100, Some(0x8100))
    assert(PcapStreamReader.ipStart(1, f).isEmpty)
    assert(PcapStreamReader.etherTypeName(1, f) == "vlan")
  }

  test("IPv6 No-Next-Header terminates chain without protocol") {
    // v6 header with next=59, enough trailing bytes to enter the walk
    val src = Array.tabulate[Byte](16)(i => (i + 1).toByte)
    val dst = Array.tabulate[Byte](16)(i => (i + 101).toByte)
    val ip6 = Array[Byte](0x60, 0, 0, 0) ++ PcapSynth.be16(0) ++
      Array[Byte](59, 64) ++ src ++ dst ++ new Array[Byte](8)
    val frame = Array.fill[Byte](12)(0x02) ++ PcapSynth.be16(0x86DD) ++ ip6
    val r = new PcapStreamReader(new java.io.ByteArrayInputStream(
      PcapSynth.file(Seq((1L, 0L, frame)))))
    val rec = r.next()
    assert(rec.protocol.isEmpty)
    assert(rec.extCount.contains(0))
    assert(rec.extHeaders.contains("[59]"))
    assert(rec.srcPort.isEmpty)
  }

  test("IPv6 HopByHop + Fragment chain walks both headers") {
    val src = Array.tabulate[Byte](16)(i => (i + 1).toByte)
    val dst = Array.tabulate[Byte](16)(i => (i + 101).toByte)
    val udp = PcapSynth.udpSegment(9000, 53, "zz".getBytes,
      src ++ dst ++ Array[Byte](0, 17), withChecksum = false)
    // HopByHop: next=44 (Fragment), len=0 (8 bytes); Fragment: next=17
    val hbh = Array[Byte](44, 0, 0, 0, 0, 0, 0, 0)
    val frag = Array[Byte](17, 0, 0, 0, 0, 0, 0, 1)
    val payloadLen = hbh.length + frag.length + udp.length
    val ip6 = Array[Byte](0x60, 0, 0, 0) ++ PcapSynth.be16(payloadLen) ++
      Array[Byte](0, 64) ++ src ++ dst ++ hbh ++ frag ++ udp
    val frame = Array.fill[Byte](12)(0x02) ++ PcapSynth.be16(0x86DD) ++ ip6
    val r = new PcapStreamReader(new java.io.ByteArrayInputStream(
      PcapSynth.file(Seq((1L, 0L, frame)))))
    val rec = r.next()
    assert(rec.protocol.contains("UDP"))
    assert(rec.extCount.contains(2))
    assert(rec.extHeaders.contains("[HopByHop][Fragment][UDP]"))
    assert(rec.frag.contains(true))
    assert(rec.srcPort.contains(9000))
  }

  test("TCP frame: ports, header-length walk, payload slice, no udpsum") {
    val frame = PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      srcPort = 443, dstPort = 51000, ttl = 55,
      payload = "tcp-data".getBytes, tcpHeaderWords = 8) // 32-byte header
    val r = new PcapStreamReader(new java.io.ByteArrayInputStream(
      PcapSynth.file(Seq((1L, 0L, frame)))), DecodeOptions.dns)
    val rec = r.next()
    assert(rec.protocol.contains("TCP"))
    assert(rec.srcPort.contains(443))
    assert(rec.dstPort.contains(51000))
    assert(rec.len.contains(8))       // payload after the 32-byte header
    assert(rec.udpsum.isEmpty)        // UDP-only field
    assert(rec.dns.isEmpty)
  }

  test("DNS-over-TCP is never decoded (reference parity)") {
    // valid DNS message on TCP port 53 — reference's dnsjava always fails
    // on the stream framing, so fields stay absent; we skip by protocol
    val frame = PcapSynth.ipv4TcpFrame(
      src = Array[Byte](1, 1, 1, 1), dst = Array[Byte](2, 2, 2, 2),
      srcPort = 40000, dstPort = 53, ttl = 60,
      payload = PcapSynth.be16(30) ++ PcapSynth.dnsQuery(5, "x.example.com"))
    val r = new PcapStreamReader(new java.io.ByteArrayInputStream(
      PcapSynth.file(Seq((1L, 0L, frame)))), DecodeOptions.dns)
    val rec = r.next()
    assert(rec.protocol.contains("TCP") && rec.dstPort.contains(53))
    assert(rec.dns.isEmpty)
  }
}
