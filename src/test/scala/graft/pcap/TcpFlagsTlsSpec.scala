package graft.pcap

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TlsParse, TlsServerParse}

/** tcp_flags/tcp_ack decode (superset columns — the reference stops at
  * ports) and the clean-room TLS ClientHello parser. */
class TcpFlagsTlsSpec extends AnyFunSuite {

  private def decodeOne(frame: Array[Byte]): PacketRecord = {
    val r = new PcapStreamReader(new java.io.ByteArrayInputStream(
      PcapSynth.file(Seq((1L, 0L, frame)))), DecodeOptions.dns)
    r.next()
  }

  test("TCP flags render LSB-first with '|', ack decodes as u32") {
    val syn = decodeOne(PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      srcPort = 1, dstPort = 2, ttl = 64, payload = Array.emptyByteArray,
      seq = 7, flags = 0x02))
    assert(syn.tcpFlags.contains("SYN"))
    assert(syn.tcpAck.contains(0L))

    val synAck = decodeOne(PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 2), dst = Array[Byte](10, 0, 0, 1),
      srcPort = 2, dstPort = 1, ttl = 64, payload = Array.emptyByteArray,
      seq = 9, ack = 8, flags = 0x12))
    assert(synAck.tcpFlags.contains("SYN|ACK"))
    assert(synAck.tcpAck.contains(8L))
    assert(synAck.tcpSeq.contains(9L))

    val pshAck = decodeOne(PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      srcPort = 1, dstPort = 2, ttl = 64, payload = "x".getBytes,
      flags = 0x18))
    assert(pshAck.tcpFlags.contains("PSH|ACK"))
  }

  test("NS bit (bit 8, data-offset byte bit 0) joins the mnemonic") {
    val r = decodeOne(PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      srcPort = 1, dstPort = 2, ttl = 64, payload = Array.emptyByteArray,
      flags = 0x102))                 // NS + SYN
    assert(r.tcpFlags.contains("SYN|NS"))
  }

  test("tcp_window decodes as unsigned 16-bit, absent when truncated") {
    val r = decodeOne(PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      srcPort = 1, dstPort = 2, ttl = 64, payload = Array.emptyByteArray,
      flags = 0x10, window = 64240))
    assert(r.tcpWindow.contains(64240))
    val zero = decodeOne(PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      srcPort = 1, dstPort = 2, ttl = 64, payload = Array.emptyByteArray,
      flags = 0x10, window = 0))
    assert(zero.tcpWindow.contains(0))
    // cut between the flags byte and the window field
    val full = PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      srcPort = 1, dstPort = 2, ttl = 64, payload = Array.emptyByteArray,
      flags = 0x10, window = 7)
    val cut = java.util.Arrays.copyOf(full, 14 + 20 + 15)
    val r2 = decodeOne(cut)
    assert(r2.tcpFlags.contains("ACK") && r2.tcpWindow.isEmpty)
  }

  test("u32 wrap: ack above Int.MaxValue survives as unsigned") {
    val r = decodeOne(PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      srcPort = 1, dstPort = 2, ttl = 64, payload = Array.emptyByteArray,
      seq = 0xFFFFFFFFL, ack = 0x80000001L, flags = 0x10))
    assert(r.tcpSeq.contains(0xFFFFFFFFL))
    assert(r.tcpAck.contains(0x80000001L))
  }

  test("truncated TCP header: seq/ack absent, no exception") {
    // frame cut 13 bytes into the TCP header: seq/ack bytes missing
    val full = PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      srcPort = 1, dstPort = 2, ttl = 64, payload = Array.emptyByteArray,
      flags = 0x02)
    val cut = java.util.Arrays.copyOf(full, 14 + 20 + 7)
    val r = decodeOne(cut)
    assert(r.srcPort.contains(1))
    assert(r.tcpSeq.isEmpty && r.tcpAck.isEmpty && r.tcpFlags.isEmpty)
  }

  test("IPv6 TCP: flags/seq/ack decode through the shared L4 branch") {
    // hand-built Ethernet + IPv6 (next header 6) + 20-byte TCP SYN|ACK
    val src = Array.tabulate[Byte](16)(i => (i + 1).toByte)
    val dst = Array.tabulate[Byte](16)(i => (i + 101).toByte)
    val tcp = new Array[Byte](20)
    Array.copy(PcapSynth.be16(443), 0, tcp, 0, 2)
    Array.copy(PcapSynth.be16(51000), 0, tcp, 2, 2)
    Array.copy(PcapSynth.be32(77), 0, tcp, 4, 4)
    Array.copy(PcapSynth.be32(13), 0, tcp, 8, 4)
    tcp(12) = 0x50 // data offset 5 words
    tcp(13) = 0x12 // SYN|ACK
    val ip6 = Array[Byte](0x60, 0, 0, 0) ++ PcapSynth.be16(tcp.length) ++
      Array[Byte](6, 64) ++ src ++ dst
    val eth = Array.fill[Byte](12)(0x02) ++ PcapSynth.be16(0x86DD.toShort)
    val r = decodeOne(eth ++ ip6 ++ tcp)
    assert(r.protocol.contains("TCP") && r.srcPort.contains(443))
    assert(r.tcpFlags.contains("SYN|ACK"))
    assert(r.tcpSeq.contains(77L) && r.tcpAck.contains(13L))
  }

  test("ICMPv4: type/code decode, payload after the 8-byte header") {
    val r = decodeOne(PcapSynth.ipv4IcmpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      ttl = 64, icmpType = 8, code = 0, echoId = 7, echoSeq = 3,
      payload = "ping-data".getBytes))
    assert(r.protocol.contains("ICMP"))
    assert(r.icmpType.contains(8) && r.icmpCode.contains(0))
    assert(r.len.contains(9))
    assert(r.srcPort.isEmpty && r.tcpFlags.isEmpty)

    val unreach = decodeOne(PcapSynth.ipv4IcmpFrame(
      src = Array[Byte](10, 0, 0, 2), dst = Array[Byte](10, 0, 0, 1),
      ttl = 64, icmpType = 3, code = 1))
    assert(unreach.icmpType.contains(3) && unreach.icmpCode.contains(1))
  }

  test("ICMPv6: type/code decode after the v6 header") {
    // hand-built Ethernet + IPv6 (next header 58) + echo request (128)
    val src = Array.tabulate[Byte](16)(i => (i + 1).toByte)
    val dst = Array.tabulate[Byte](16)(i => (i + 101).toByte)
    val icmp6 = Array[Byte](128.toByte, 0, 0, 0, 0, 7, 0, 1) ++
      "v6ping".getBytes
    val ip6 = Array[Byte](0x60, 0, 0, 0) ++ PcapSynth.be16(icmp6.length) ++
      Array[Byte](58, 64) ++ src ++ dst
    val eth = Array.fill[Byte](12)(0x02) ++ PcapSynth.be16(0x86DD.toShort)
    val r = decodeOne(eth ++ ip6 ++ icmp6)
    assert(r.protocol.contains("ICMPv6"))
    assert(r.icmpType.contains(128) && r.icmpCode.contains(0))
    assert(r.len.contains(6))
  }

  test("truncated ICMP header: type/code absent, no exception") {
    val full = PcapSynth.ipv4IcmpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      ttl = 64, icmpType = 8, code = 0)
    val cut = java.util.Arrays.copyOf(full, 14 + 20 + 1)
    val r = decodeOne(cut)
    assert(r.protocol.contains("ICMP"))
    assert(r.icmpType.isEmpty && r.icmpCode.isEmpty)
  }

  test("tcp_flags equality is a pushable row-skip predicate") {
    import org.apache.spark.sql.sources.{EqualTo, StringContains}
    assert(graft.sources.pcap.PcapPacketFilter.supported(
      EqualTo("tcp_flags", "SYN")))
    // the TcpFlag membership predicates compile to contains() — they
    // must stay pushable or the ECN-safe queries lose the row-skip
    assert(graft.sources.pcap.PcapPacketFilter.supported(
      StringContains("tcp_flags", "SYN")))
  }

  test("all-zero flags byte leaves tcp_flags unset (no empty-string mnemonic)") {
    val r = decodeOne(PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      srcPort = 1, dstPort = 2, ttl = 64, payload = Array.emptyByteArray,
      flags = 0))
    assert(r.tcpFlags.isEmpty)
    assert(r.srcPort.contains(1))      // the rest of L4 still decodes
  }

  test("IHL < 5 is rejected before L4/ICMP decode") {
    // patch the version/IHL byte from 0x45 to 0x44: the claimed header
    // is shorter than the fixed IPv4 header, so the L4 offset would
    // land inside the IP header itself
    val tcp = PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      srcPort = 1, dstPort = 2, ttl = 64, payload = Array.emptyByteArray,
      flags = 0x02)
    tcp(14) = 0x44
    val r = decodeOne(tcp)
    assert(r.protocol.contains("TCP")) // L3 fields still decode
    assert(r.srcPort.isEmpty && r.tcpFlags.isEmpty && r.tcpSeq.isEmpty)

    val icmp = PcapSynth.ipv4IcmpFrame(
      src = Array[Byte](10, 0, 0, 1), dst = Array[Byte](10, 0, 0, 2),
      ttl = 64, icmpType = 8, code = 0)
    icmp(14) = 0x44
    val ri = decodeOne(icmp)
    assert(ri.protocol.contains("ICMP"))
    assert(ri.icmpType.isEmpty && ri.icmpCode.isEmpty)
  }

  // ----- TLS ClientHello parser ------------------------------------------

  private def field(row: org.apache.spark.sql.catalyst.InternalRow,
      i: Int): String =
    if (row.isNullAt(i)) null else row.getUTF8String(i).toString

  test("golden: synthetic hellos parse to the generator's spec") {
    for (f <- 0 until 40) {
      val row = TlsParse.parse(PcapSynth.tlsClientHello(f))
      assert(row != null, s"flow $f")
      val tld = Seq("com", "org", "net")(f % 3)
      assert(field(row, 0) == f"host$f%03d.example.$tld")
      assert(field(row, 1) == (if (f % 2 == 1) "TLS1.3" else "TLS1.2"))
      assert(row.getInt(2) == 8 + f % 5)
      val alpn = Seq("h2", "http/1.1", null)(f % 3)
      assert(field(row, 3) == alpn)
      // fingerprint re-derived from the generator spec, not the parser
      val ciphers = (0 until 8 + f % 5).map(0x1301 + _).toArray
      val ext = Array(0) ++
        (if (f % 3 != 2) Array(16) else Array.empty[Int]) ++
        (if (f % 2 == 1) Array(43) else Array.empty[Int])
      assert(field(row, 4) == TlsParse.fingerprint(0x0303, ciphers, ext),
        s"flow $f fingerprint")
    }
  }

  // ----- TLS ServerHello parser (JA3S twin) -------------------------------

  test("golden: synthetic server hellos parse to the generator's spec") {
    for (f <- 0 until 40) {
      val row = TlsServerParse.parse(PcapSynth.tlsServerHello(f))
      assert(row != null, s"flow $f")
      assert(field(row, 0) == (if (f % 2 == 1) "TLS1.3" else "TLS1.2"))
      assert(row.getInt(1) == 0x1301 + f % 5)
      val alpn = Seq("h2", "http/1.1", null)(f % 3)
      assert(field(row, 2) == alpn)
      // fingerprint re-derived from the generator spec, not the parser
      val ext = Array(65281) ++
        (if (f % 3 != 2) Array(16) else Array.empty[Int]) ++
        (if (f % 2 == 1) Array(43) else Array.empty[Int])
      assert(field(row, 3) ==
        TlsParse.fingerprint(0x0303, Array(0x1301 + f % 5), ext),
        s"flow $f ja3s")
    }
  }

  test("server hello: truncations null, garbage never throws, " +
      "client/server cross-parse rejects") {
    val full = PcapSynth.tlsServerHello(7)
    for (n <- 0 until full.length)
      assert(TlsServerParse.parse(
        java.util.Arrays.copyOf(full, n)) == null, s"$n")
    assert(TlsServerParse.parse(full ++ Array[Byte](9)) != null)
    val rnd = new scala.util.Random(20260814)
    for (_ <- 0 until 3000) {
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      if (b.length > 6 && rnd.nextBoolean()) {
        b(0) = 0x16; b(1) = 3; b(5) = 2
      }
      TlsServerParse.parse(b)
    }
    // handshake-type gate: a ClientHello is not a ServerHello & vice versa
    assert(TlsServerParse.parse(PcapSynth.tlsClientHello(3)) == null)
    assert(TlsParse.parse(PcapSynth.tlsServerHello(3)) == null)
  }

  test("a stray trailing byte after compression methods rejects " +
      "(both hellos); the clean extension-less form parses") {
    // minimal extension-less ClientHello, optionally with one stray
    // byte INSIDE self-consistent record/handshake lengths — the
    // exact-length discipline must reject the stray form, not emit a
    // fabricated no-extension fingerprint
    def mini(stray: Boolean, server: Boolean): Array[Byte] = {
      val body = scala.collection.mutable.ArrayBuffer[Byte]()
      def h(i: Int): Unit = body += i.toByte
      def h16(v: Int): Unit = { h(v >> 8); h(v & 0xFF) }
      h16(0x0303); (0 until 32).foreach(_ => h(7)); h(0)
      if (server) { h16(0x1301); h(0) }            // one cipher + comp
      else { h16(2); h16(0x1301); h(1); h(0) }     // list + comp list
      if (stray) h(0x55)
      val hs = Array[Byte](if (server) 2 else 1, 0,
        ((body.length >> 8) & 0xFF).toByte,
        (body.length & 0xFF).toByte) ++ body
      Array[Byte](0x16, 3, 3,
        ((hs.length >> 8) & 0xFF).toByte,
        (hs.length & 0xFF).toByte) ++ hs
    }
    assert(TlsParse.parse(mini(stray = false, server = false)) != null)
    assert(TlsParse.parse(mini(stray = true, server = false)) == null)
    assert(TlsServerParse.parse(mini(stray = false, server = true)) != null)
    assert(TlsServerParse.parse(mini(stray = true, server = true)) == null)
  }

  test("every proper truncation of a valid hello returns null, never throws") {
    val full = PcapSynth.tlsClientHello(7)
    for (n <- 0 until full.length) {
      // the record header declares the full length, so every proper
      // prefix MUST reject — a partial parse could silently drop tail
      // extensions and emit a wrong version/fingerprint
      assert(TlsParse.parse(java.util.Arrays.copyOf(full, n)) == null, s"$n")
    }
    // trailing extra bytes after a complete record are fine (streams)
    assert(TlsParse.parse(full ++ Array[Byte](1, 2, 3)) != null)
  }

  test("fuzz: arbitrary bytes never throw") {
    val rnd = new scala.util.Random(20260813)
    for (_ <- 0 until 3000) {
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      // bias some inputs toward the handshake magic to reach deeper paths
      if (b.length > 6 && rnd.nextBoolean()) {
        b(0) = 0x16; b(1) = 3; b(5) = 1
      }
      TlsParse.parse(b) // must not throw
    }
  }

  test("segmented hellos parse only after reassembly") {
    // mirrors tlsFlowSegments' chunking: every individual segment of a
    // multi-segment flow must NOT parse (cuts land mid-record), while
    // the reassembled concatenation must — the property
    // pcap_tls_sni_reassembled's oracle rests on
    for (f <- 0 until 40 if f % 3 != 0) {
      val hello = PcapSynth.tlsClientHello(f)
      val nSeg = 1 + f % 3
      val base = hello.length / nSeg
      val chunks = (0 until nSeg).map { k =>
        val to = if (k == nSeg - 1) hello.length else base * (k + 1)
        java.util.Arrays.copyOfRange(hello, base * k, to)
      }
      chunks.foreach(c => assert(TlsParse.parse(c) == null, s"flow $f"))
      assert(TlsParse.parse(chunks.reduce(_ ++ _)) != null, s"flow $f")
    }
  }

  test("coalesced handshake messages (hsLen < record) return null") {
    // grow the declared record length so the ClientHello no longer fills
    // it — as if a second handshake message were coalesced behind it.
    // Parsing must NOT run past the handshake body into the extra bytes
    val hello = PcapSynth.tlsClientHello(5)
    val extra = Array[Byte](0x0E, 0, 0, 0) // a 0-length ServerHelloDone
    val recLen = hello.length - 5 + extra.length
    val coalesced = hello ++ extra
    coalesced(3) = ((recLen >> 8) & 0xFF).toByte
    coalesced(4) = (recLen & 0xFF).toByte
    assert(TlsParse.parse(coalesced) == null)
    // sanity: the untampered hello still parses
    assert(TlsParse.parse(hello) != null)
  }

  test("extensions length disagreeing with the record is rejected, not clamped") {
    val f = 5
    val hello = PcapSynth.tlsClientHello(f)
    // extensions-length field position, from the generator's layout:
    // record(5) + hs(4) + version(2) + random(32) + sid(1) + cs_len(2) +
    // ciphers + comp(2)
    val extLenPos = 9 + 2 + 32 + 1 + 2 + (8 + f % 5) * 2 + 2
    val declared = ((hello(extLenPos) & 0xFF) << 8) | (hello(extLenPos + 1) & 0xFF)
    // under-declare by one extension header: a clamping parser would
    // silently parse a truncated extension list → wrong fingerprint
    val lying = declared - 4
    hello(extLenPos) = ((lying >> 8) & 0xFF).toByte
    hello(extLenPos + 1) = (lying & 0xFF).toByte
    assert(TlsParse.parse(hello) == null)
  }

  test("non-ClientHello records are rejected") {
    // application_data record
    assert(TlsParse.parse(Array[Byte](0x17, 3, 3, 0, 5, 1, 2, 3, 4, 5)) == null)
    // ServerHello handshake
    val sh = PcapSynth.tlsClientHello(0)
    sh(5) = 2
    assert(TlsParse.parse(sh) == null)
  }
}
