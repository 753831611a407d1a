package graft.pcap

import java.io.{ByteArrayInputStream, IOException}

import org.scalatest.funsuite.AnyFunSuite

/** pcapng container reader: block framing, per-interface link types and
  * timestamp resolutions, sniffer dispatch, DNS parity with classic pcap. */
class PcapNgSpec extends AnyFunSuite {

  private def udpPkt(i: Int, payload: Array[Byte] = new Array[Byte](8)) =
    PcapSynth.ipv4UdpFrame(
      Array[Byte](10, 0, 0, i.toByte), Array[Byte](10, 0, 0, 99),
      1000 + i, 2000, ttl = 64, payload = payload)

  private def read(bytes: Array[Byte],
      opts: DecodeOptions = DecodeOptions()): List[PacketRecord] =
    PacketReaders.open(new ByteArrayInputStream(bytes), opts).toList

  test("EPB packets decode identically to the same frames in classic pcap") {
    val frames = (1 to 3).map(udpPkt(_))
    val sec = 1700000000L
    val ng = PcapSynth.fileNg(Seq(1),
      frames.zipWithIndex.map { case (f, i) =>
        (0, (sec + i) * 1000000L + 42L, f) })
    val classic = PcapSynth.file(
      frames.zipWithIndex.map { case (f, i) => (sec + i, 42L, f) })
    val got = read(ng)
    val want = read(classic)
    assert(got == want)
    assert(got.head.tsMicro.contains(sec * 1000000L + 42L))
  }

  test("if_tsresol is honored (millisecond and 2^-10 resolutions)") {
    val f = udpPkt(1)
    // 10^-3: units are milliseconds
    val ms = read(PcapSynth.fileNg(Seq(1),
      Seq((0, 1700000000L * 1000L + 123L, f)), tsresolRaw = 3))
    assert(ms.head.ts.contains(1700000000L))
    assert(ms.head.tsMicro.contains(1700000000L * 1000000L + 123000L))
    // 2^-10: 1024 units per second
    val p2 = read(PcapSynth.fileNg(Seq(1),
      Seq((0, 1700000000L * 1024L + 512L, f)), tsresolRaw = 0x8A))
    assert(p2.head.ts.contains(1700000000L))
    assert(p2.head.tsMicro.contains(1700000000L * 1000000L + 500000L))
  }

  test("multi-interface file routes frames to each interface's link type") {
    // if0 = EN10MB (Ethernet frame), if1 = RAW (bare IP packet)
    val ether = udpPkt(1)
    val rawIp = ether.drop(14)
    val ng = PcapSynth.fileNg(Seq(1, 101), Seq(
      (0, 1700000000L * 1000000L, ether),
      (1, 1700000001L * 1000000L, rawIp)))
    val got = read(ng)
    assert(got.length == 2)
    assert(got(0).etherType.contains("IPv4"))
    assert(got(1).etherType.contains("")) // non-Ethernet link: "" (parity)
    assert(got.forall(_.srcPort.contains(1001)))
  }

  test("DNS decodes through pcapng exactly as through classic pcap") {
    val dnsFrame = PcapSynth.ipv4UdpFrame(
      Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2),
      5353, 53, ttl = 64,
      payload = PcapSynth.dnsQuery(7, "Example.COM", qtype = 28))
    val ng = PcapSynth.fileNg(Seq(1), Seq((0, 1L, dnsFrame)))
    val got = read(ng, DecodeOptions.dns)
    assert(got.head.dns.flatMap(_.qname).contains("example.com."))
    assert(got.head.dns.flatMap(_.qtypeStr).contains("AAAA"))
  }

  test("unknown blocks are skipped; sniffer picks the right reader") {
    val f = udpPkt(1)
    val base = PcapSynth.fileNg(Seq(1), Seq((0, 1L, f)))
    // splice a Name Resolution Block (type 4) between IDB and EPB:
    // locate the EPB (type 6) and insert before it
    def le(v: Long) = PcapSynth.le32(v)
    val nrb = le(4L) ++ le(16L) ++ le(0L) ++ le(16L)
    // EPB starts after SHB(28) + IDB(20)
    val insertAt = 28 + 20
    val spliced = base.take(insertAt) ++ nrb ++ base.drop(insertAt)
    assert(read(spliced).length == 1)
    // classic files still route to the classic reader through the sniffer
    val classic = PcapSynth.file(Seq((1L, 0L, f)))
    assert(read(classic).length == 1)
  }

  test("corrupt lengths fail cleanly (no huge allocations, no hangs)") {
    // classic: capLen = 0xFFFFFFFF must raise IOException, not attempt a
    // 4 GiB allocation / NegativeArraySizeException
    val classic = PcapSynth.file(Seq((1L, 0L, udpPkt(1))))
    val badCap = classic.clone()
    (24 + 8 until 24 + 12).foreach(i => badCap(i) = 0xFF.toByte)
    assertThrows[IOException] {
      new PcapStreamReader(
        new ByteArrayInputStream(badCap), DecodeOptions()).toList
    }
    // pcapng: corrupt block total length likewise
    val ng = PcapSynth.fileNg(Seq(1), Seq((0, 1L, udpPkt(1))))
    val badBlock = ng.clone()
    (28 + 4 until 28 + 8).foreach(i => badBlock(i) = 0xFF.toByte)
    assertThrows[IOException] { read(badBlock) }
  }

  test("seeded byte-mutation fuzz: reader terminates, IOException at worst") {
    val rnd = new scala.util.Random(4242)
    val base = PcapSynth.fileNg(Seq(1),
      (1 to 5).map(i => (0, i.toLong * 1000000L, udpPkt(i))))
    (1 to 300).foreach { _ =>
      val mutated = base.clone()
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      try {
        val recs = read(mutated)
        assert(recs.length <= 64) // framing bounds: no runaway record loop
      } catch {
        case _: IOException => () // clean rejection is fine
      }
    }
  }

  test("dns+tcp decoder parses DNS-over-TCP; plain dns decoder skips it") {
    val q = PcapSynth.dnsQuery(9, "tcp.example.org", qtype = 1)
    val tcpPayload = PcapSynth.be16(q.length) ++ q // RFC 1035 length prefix
    val frame = PcapSynth.ipv4TcpFrame(
      Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2),
      40000, 53, ttl = 64, payload = tcpPayload)
    val f = PcapSynth.file(Seq((1L, 0L, frame)))
    // reference-parity decoder: DNS-over-TCP stays undecoded
    val plain = read(f, DecodeOptions(appDecoder = Some(DnsPayloadDecoder)))
    assert(plain.head.dns.isEmpty)
    // extension decoder: strips the 2-byte prefix and parses
    val tcp = read(f, DecodeOptions(appDecoder = Some(DnsTcpPayloadDecoder)))
    assert(tcp.head.dns.flatMap(_.qname).contains("tcp.example.org."))
    assert(tcp.head.dns.map(_.queryId).contains(9))
    // truncated message (prefix longer than capture) -> silently skipped
    val shortFrame = PcapSynth.ipv4TcpFrame(
      Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2),
      40000, 53, ttl = 64,
      payload = PcapSynth.be16(q.length + 100) ++ q)
    val cut = read(PcapSynth.file(Seq((1L, 0L, shortFrame))),
      DecodeOptions(appDecoder = Some(DnsTcpPayloadDecoder)))
    assert(cut.head.dns.isEmpty)
  }

  test("SPB: snaplen clamps captured length; pad bytes never leak") {
    val frame = udpPkt(1) // 50 bytes on the wire
    // untruncated SPB: full frame decodes like an EPB would
    val full = read(PcapSynth.fileNgSpb(1, 65535L,
      Seq((frame.length.toLong, frame))))
    assert(full.head.size.contains(frame.length.toLong))
    assert(full.head.srcPort.contains(1001))
    assert(full.head.ts.isEmpty) // SPB has no timestamp
    // snaplen-truncated SPB: writer stored only snaplen bytes, body is
    // 32-bit padded. capLen must be snaplen (10), not body-4 (12) —
    // the 2 pad bytes are not packet data
    val snap = 10L
    val stored = frame.take(10)
    val trunc = read(PcapSynth.fileNgSpb(1, snap,
      Seq((frame.length.toLong, stored))))
    assert(trunc.head.size.contains(10L))
    // snaplen 0 = no limit: falls back to origLen/body clamp
    val nolimit = read(PcapSynth.fileNgSpb(1, 0L,
      Seq((frame.length.toLong, frame))))
    assert(nolimit.head.size.contains(frame.length.toLong))
  }

  test("SPB/EPB corrupt 32-bit lengths throw instead of wrapping negative") {
    // SPB origLen = 0xFFFFFFFF: would wrap to -1 via toInt
    val badSpb = PcapSynth.fileNgSpb(1, 65535L,
      Seq((0xFFFFFFFFL, udpPkt(1))))
    assertThrows[IOException] { read(badSpb) }
    // EPB capLen forced to 0xFFFFFFF0 (keeps block length plausible)
    val ng = PcapSynth.fileNg(Seq(1), Seq((0, 1L, udpPkt(1))))
    val epbAt = 28 + 20 // SHB(28) + IDB(20)
    val bad = ng.clone()
    val capOff = epbAt + 8 + 12 // block header 8 + ifId/tsHi/tsLo 12
    bad(capOff) = 0xF0.toByte; bad(capOff + 1) = 0xFF.toByte
    bad(capOff + 2) = 0xFF.toByte; bad(capOff + 3) = 0xFF.toByte
    assertThrows[IOException] { read(bad) }
  }

  test("corrupt SHB total length / exotic tsresol rejected") {
    val ng = PcapSynth.fileNg(Seq(1), Seq((0, 1L, udpPkt(1))))
    // SHB total length 12 (< 28): must throw, not silently no-op the skip
    val badShb = ng.clone()
    val le12 = PcapSynth.le32(12L)
    (0 until 4).foreach(i => badShb(4 + i) = le12(i))
    assertThrows[IOException] { read(badShb) }
    // if_tsresol 10^-42 and 2^-77 overflow a Long: clean rejection
    assertThrows[IOException] {
      read(PcapSynth.fileNg(Seq(1), Seq((0, 1L, udpPkt(1))),
        tsresolRaw = 42))
    }
    assertThrows[IOException] {
      read(PcapSynth.fileNg(Seq(1), Seq((0, 1L, udpPkt(1))),
        tsresolRaw = 0x80 | 77))
    }
  }

  test("bad byte-order magic throws") {
    val base = PcapSynth.fileNg(Seq(1), Seq((0, 1L, udpPkt(1))))
    val bad = base.clone()
    bad(8) = 0x42 // corrupt the byte-order magic inside the SHB
    assertThrows[IOException] { read(bad) }
  }
}
