package graft.pcap

import org.scalatest.funsuite.AnyFunSuite

/** Tunnel decap hardening: capture bytes are untrusted, so
  * [[Decap.vxlan]] / [[Decap.gre]] must never throw — on random
  * garbage, on every truncation of a valid encapsulation, and on
  * flag/version corruptions — and must recover the synthesis formulas'
  * inner fields exactly on the fixtures. */
class DecapSpec extends AnyFunSuite {

  /** Outer-UDP payload of a vxlanPackets frame (eth 14 + ip 20 + udp 8). */
  private def vxPayload(i: Int): Array[Byte] =
    PcapSynth.vxlanPackets(i + 1).last._3.drop(42)

  /** Outer-IP payload of a grePackets frame (eth 14 + ip 20). */
  private def grePayload(i: Int): Array[Byte] =
    PcapSynth.grePackets(i + 1).last._3.drop(34)

  test("decap never throws: random garbage + every truncation of a " +
      "valid encapsulation + corrupted headers") {
    val rnd = new scala.util.Random(777)
    (0 until 5000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(120))
      rnd.nextBytes(b)
      Decap.vxlan(b)
      Decap.gre(b)
    }
    assert(Decap.vxlan(null) == None && Decap.gre(null) == None)
    val vx = vxPayload(3)
    val gr = grePayload(3)
    (0 to vx.length).foreach(k => Decap.vxlan(vx.take(k)))
    (0 to gr.length).foreach(k => Decap.gre(gr.take(k)))
    // corrupt each header byte of the valid payloads in turn
    (0 until 8).foreach { j =>
      val c1 = vx.clone(); c1(j) = (c1(j) ^ 0xFF).toByte; Decap.vxlan(c1)
      val c2 = gr.clone(); c2(j) = (c2(j) ^ 0xFF).toByte; Decap.gre(c2)
    }
    // gating flags: VXLAN without the I flag / GRE with version != 0
    // must refuse
    val noI = vx.clone(); noI(0) = 0
    assert(Decap.vxlan(noI).isEmpty, "I-flag-less VXLAN must not decap")
    val badV = gr.clone(); badV(1) = (badV(1) | 0x7).toByte
    assert(Decap.gre(badV).isEmpty, "GRE version != 0 must not decap")
  }

  test("fixture round-trip recovers the synthesis formulas' inner fields") {
    (0 until 40).foreach { i =>
      val v = Decap.vxlan(vxPayload(i)).getOrElse(
        fail(s"vxlan packet $i did not decap"))
      assert(v.vni == 100 + i % 7)
      assert(v.src == "10.32.0.1" && v.dst == s"10.31.${i >> 8}.${i & 255}")
      assert(v.protocol == "UDP" && v.srcPort == 53 &&
        v.dstPort == 52000 + i)
      assert(v.dnsQname.contains(s"vx$i.tunnel.example.com."))
      assert(v.dnsRcode.contains(
        if (i % 9 == 0) "NXDOMAIN" else "NOERROR"))
      val g = Decap.gre(grePayload(i)).getOrElse(
        fail(s"gre packet $i did not decap"))
      assert(g.key == 200 + i % 5)
      assert(g.src == "10.52.0.1" && g.dst == s"10.51.${i >> 8}.${i & 255}")
      assert(g.protocol == "UDP" && g.srcPort == 53 &&
        g.dstPort == 51000 + i)
      assert(g.dnsQname.contains(s"gre$i.tunnel.example.com."))
      assert(g.dnsRcode.contains(
        if (i % 11 == 0) "NXDOMAIN" else "NOERROR"))
    }
  }

  /** Outer-UDP payload of a genevePackets frame (eth 14 + ip 20 + udp 8). */
  private def gvPayload(i: Int): Array[Byte] =
    PcapSynth.genevePackets(i + 1).last._3.drop(42)

  test("geneve never throws; gates on version/O-flag/protocol; the " +
      "option walk must exactly tile the declared length") {
    val rnd = new scala.util.Random(778)
    (0 until 5000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(120))
      rnd.nextBytes(b)
      Decap.geneve(b)
    }
    assert(Decap.geneve(null).isEmpty)
    val gv = gvPayload(5) // i=5 → i%3==2: two options, C set
    (0 to gv.length).foreach(k => Decap.geneve(gv.take(k)))
    (0 until 8).foreach { j =>
      val c = gv.clone(); c(j) = (c(j) ^ 0xFF).toByte; Decap.geneve(c)
    }
    // version != 0 refuses
    val badV = gv.clone(); badV(0) = (badV(0) | 0x40).toByte
    assert(Decap.geneve(badV).isEmpty, "version != 0 must not decap")
    // O flag = control packet: not a data frame, refused
    val oam = gv.clone(); oam(1) = (oam(1) | 0x80).toByte
    assert(Decap.geneve(oam).isEmpty, "O-flagged control must not decap")
    // unknown protocol type refuses
    val badP = gv.clone(); badP(2) = 0x12; badP(3) = 0x34
    assert(Decap.geneve(badP).isEmpty, "unknown ptype must not decap")
    // option walk overrun: inflate the FIRST option's data length so
    // the walk runs past the declared opt-len — malformed, refused
    // (byte 11 = first option's rsvd|len byte: offset 8 + class 2 + type 1)
    val overrun = gv.clone(); overrun(11) = 0x1F.toByte
    assert(Decap.geneve(overrun).isEmpty,
      "option body past declared length must not decap")
    // declared opt-len that does not tile option headers refuses
    // (declare one extra word with no option bytes to fill it: the
    // trailing word is the inner frame's first 4 bytes, which now
    // parse as a bogus option header — the walk must detect mis-tiling
    // or the inner decode must fail; either way, no row)
    val skew = gv.clone(); skew(0) = ((gv(0) & 0x3F) + 1).toByte
    assert(Decap.geneve(skew).isEmpty, "mis-tiled opt-len must not decap")
  }

  test("geneve fixture round-trip recovers inner fields + option counts") {
    (0 until 40).foreach { i =>
      val g = Decap.geneve(gvPayload(i)).getOrElse(
        fail(s"geneve packet $i did not decap"))
      assert(g.vni == 200 + i % 5)
      assert(g.nOptions == i % 3)
      assert(g.src == "10.34.0.1" && g.dst == s"10.33.${i >> 8}.${i & 255}")
      assert(g.protocol == "UDP" && g.srcPort == 53 &&
        g.dstPort == 51000 + i)
      assert(g.dnsQname.contains(s"gv$i.overlay.example.com."))
      assert(g.dnsRcode.contains(
        if (i % 8 == 0) "NXDOMAIN" else "NOERROR"))
    }
  }

  /** Outer-IP payload of an ipipPackets frame (eth 14 + ip 20) —
    * which IS the inner packet (no shim header). */
  private def ipipPayload(i: Int): Array[Byte] =
    PcapSynth.ipipPackets(i + 1).last._3.drop(34)

  test("ipip never throws and gates on version/protocol agreement") {
    val rnd = new scala.util.Random(778)
    (0 until 5000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(120))
      rnd.nextBytes(b)
      Decap.ipip(4, b); Decap.ipip(41, b); Decap.ipip(17, b)
    }
    assert(Decap.ipip(4, null).isEmpty && Decap.ipip(41, null).isEmpty)
    val p4 = ipipPayload(0) // even → inner v4
    val p6 = ipipPayload(1) // odd → inner v6
    (0 to p4.length).foreach(k => Decap.ipip(4, p4.take(k)))
    (0 to p6.length).foreach(k => Decap.ipip(41, p6.take(k)))
    // agreement gate: a v4 inner under outer proto 41 (and vice versa)
    // is a malformed encapsulation and must refuse
    assert(Decap.ipip(41, p4).isEmpty, "v4 inner under proto 41")
    assert(Decap.ipip(4, p6).isEmpty, "v6 inner under proto 4")
    assert(Decap.ipip(50, p4).isEmpty, "non-tunnel outer protocol")
  }

  test("ipip fixture round-trip recovers both schemes' inner fields") {
    (0 until 40).foreach { i =>
      val proto = if (i % 2 == 0) 4 else 41
      val t = Decap.ipip(proto, ipipPayload(i)).getOrElse(
        fail(s"ipip packet $i did not decap"))
      assert(t.innerV == (if (i % 2 == 0) 4 else 6))
      assert(t.protocol == "UDP" && t.srcPort == 53 &&
        t.dstPort == 50000 + i)
      if (i % 2 == 0) {
        assert(t.src == "10.72.0.1" &&
          t.dst == s"10.71.${i >> 8}.${i & 255}")
        assert(t.dnsQname.contains(s"t4-$i.tunnel.example.com."))
      } else
        assert(t.dnsQname.contains(s"t6-$i.tunnel.example.com."))
      assert(t.dnsRcode.contains(
        if (i % 13 == 0) "NXDOMAIN" else "NOERROR"))
    }
  }

  test("arp parser never throws and gates on the RFC 826 fixed fields") {
    val rnd = new scala.util.Random(779)
    (0 until 5000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(60))
      rnd.nextBytes(b)
      Decap.arp(b)
    }
    assert(Decap.arp(null).isEmpty)
    val fr = PcapSynth.arpPackets(1).head._3 // device 0's request
    (0 to fr.length).foreach(k => Decap.arp(fr.take(k)))
    val a = Decap.arp(fr).getOrElse(fail("fixture ARP did not parse"))
    assert(a.oper == 1 && a.sha == "02:00:00:00:00:00" &&
      a.spa == "10.90.0.0" && a.tpa == "10.90.0.1")
    // wrong ethertype / htype / sizes must refuse
    val bad1 = fr.clone(); bad1(13) = 0; assert(Decap.arp(bad1).isEmpty)
    val bad2 = fr.clone(); bad2(15) = 9; assert(Decap.arp(bad2).isEmpty)
    val bad3 = fr.clone(); bad3(18) = 8; assert(Decap.arp(bad3).isEmpty)
  }

  test("dhcp parser never throws; gates on cookie/op/option-53; " +
      "recovers the fixture fields") {
    val rnd = new scala.util.Random(780)
    (0 until 5000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      Decap.dhcp(b)
    }
    assert(Decap.dhcp(null).isEmpty)
    // fixture: frame 1 is the server's OFFER to client 0
    val offer = PcapSynth.dhcpPackets(1)(1)._3.drop(42)
    (0 to offer.length).foreach(k => Decap.dhcp(offer.take(k)))
    val f = Decap.dhcp(offer).getOrElse(fail("OFFER did not parse"))
    assert(f.op == 2 && f.msgType == 2 && f.xid == 0xA000L)
    assert(f.yiaddr == "10.95.0.0" && f.chaddr == "02:00:00:00:00:00")
    assert(f.serverId.contains("10.95.0.1"))
    // bad magic cookie / BOOTP-without-option-53 must refuse
    val badMagic = offer.clone(); badMagic(236) = 0
    assert(Decap.dhcp(badMagic).isEmpty)
    val no53 = offer.clone(); no53(240) = 60 // overwrite option code
    assert(Decap.dhcp(no53).isEmpty)
    // a truncated option list yields what parsed before the damage
    val cut = offer.dropRight(1) // remove END
    assert(Decap.dhcp(cut).exists(_.msgType == 2))
  }

  test("GRE optional-word layouts parse: no-key, and key+seq+checksum") {
    // hand-build a GRE header variant around fixture 0's inner packet
    val inner = grePayload(0).drop(8) // strip the fixture's K-flag header
    // bare header (no options): key reads as 0
    val bare = Array[Byte](0, 0, 0x08, 0) ++ inner
    val g0 = Decap.gre(bare).getOrElse(fail("bare GRE did not decap"))
    assert(g0.key == 0L && g0.srcPort == 53)
    // C + K + S: checksum word, key word, sequence word
    val full = Array[Byte](0xB0.toByte, 0, 0x08, 0,
      0, 0, 0, 0, // checksum + reserved
      0, 0, 0x30, 0x39, // key = 12345
      0, 0, 0, 7) ++ inner // sequence
    val g1 = Decap.gre(full).getOrElse(fail("C|K|S GRE did not decap"))
    assert(g1.key == 12345L && g1.dstPort == 51000)
  }

  test("sip parser: requests + responses, compact headers, CSeq " +
      "correlation, URI unwrap; never throws on garbage") {
    def m(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val inv = m("INVITE sip:bob@b.example.com SIP/2.0\r\n" +
      "Call-ID: abc@x\r\nFrom: <sip:alice@a>\r\nTo: <sip:bob@b>\r\n" +
      "CSeq: 1 INVITE\r\n\r\n")
    val r = Decap.sip(inv).get
    assert(r.method == "INVITE" && r.status == 0 && r.callId == "abc@x" &&
      r.fromUri == "sip:alice@a" && r.toUri == "sip:bob@b")
    // response: method comes from CSeq, not the start line
    val ok = m("SIP/2.0 200 OK\r\nCall-ID: abc@x\r\n" +
      "From: sip:alice@a\r\nTo: sip:bob@b\r\nCSeq: 2 BYE\r\n\r\n")
    val ro = Decap.sip(ok).get
    assert(ro.method == "BYE" && ro.status == 200 &&
      ro.fromUri == "sip:alice@a") // bare URIs pass through
    // compact Call-ID form + case-insensitive names
    val compact = m("BYE sip:bob@b SIP/2.0\r\ni: zz@y\r\n" +
      "FROM: <sip:a@a>\r\nto: <sip:b@b>\r\nCSeq: 2 BYE\r\n\r\n")
    assert(Decap.sip(compact).exists(x =>
      x.callId == "zz@y" && x.method == "BYE"))
    // missing Call-ID, non-SIP start lines, HTTP -> None
    assert(Decap.sip(m("INVITE sip:x SIP/2.0\r\nFrom: a\r\nTo: b\r\n\r\n"))
      .isEmpty)
    assert(Decap.sip(m("GET / HTTP/1.1\r\nHost: x\r\n\r\n")).isEmpty)
    assert(Decap.sip(m("SIP/2.0 abc\r\n\r\n")).isEmpty)
    assert(Decap.sip(null).isEmpty)
    val rnd = new scala.util.Random(780)
    (0 until 3000).foreach { _ =>
      val g = new Array[Byte](rnd.nextInt(150))
      rnd.nextBytes(g)
      Decap.sip(g)
    }
    (0 to inv.length).foreach(k => Decap.sip(inv.take(k)))
  }

  test("rtp parser never throws; gates on version 2 and header length") {
    val rnd = new scala.util.Random(778)
    (0 until 5000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(40))
      rnd.nextBytes(b)
      Decap.rtp(b) // must not throw
    }
    assert(Decap.rtp(null).isEmpty)
    // a valid fixture packet parses to the synthesis formulas' fields
    val fr = PcapSynth.rtpPackets(3).head._3 // stream 0: j=0 lost, j=1 first
    val pl = fr.drop(42) // eth 14 + ip 20 + udp 8
    val r = Decap.rtp(pl).getOrElse(fail("fixture RTP did not parse"))
    assert(r.version == 2 && r.pt == 0)
    assert(r.seq == 7001 && r.rtpTs == 160L && r.ssrc == 1000000L)
    // truncations of the fixed header never parse
    (0 until 12).foreach(k => assert(Decap.rtp(pl.take(k)).isEmpty))
    // version corruption rejects
    val bad = pl.clone(); bad(0) = 0x40.toByte // version 1
    assert(Decap.rtp(bad).isEmpty)
    // unsigned 32-bit words stay non-negative at the top of the range
    val hi = pl.clone()
    hi(4) = 0xFF.toByte; hi(5) = 0xFF.toByte
    hi(6) = 0xFF.toByte; hi(7) = 0xFF.toByte
    hi(8) = 0x80.toByte
    val r2 = Decap.rtp(hi).get
    assert(r2.rtpTs == 0xFFFFFFFFL && r2.ssrc >= 0x80000000L)
  }
}
