package graft.pcap

import org.scalatest.funsuite.AnyFunSuite

class DnsParserSpec extends AnyFunSuite {

  test("whitespace normalization (DnsPcapReaderTest.java:24-29 invariant)") {
    assert(DnsParser.normalize("a\t\tb   c\td") == "a b c d")
    assert(DnsParser.normalize(". 32768\tCLASS4096  OPT") == ". 32768 CLASS4096 OPT")
  }

  test("parse minimal query: header, flags, lowercased qname") {
    val msg = PcapSynth.dnsQuery(0x1234, "WWW.Example.COM", qtype = 28)
    val d = DnsParser.parse(msg).get
    assert(d.queryId == 0x1234)
    assert(d.flags == "rd")
    assert(!d.qr)
    assert(d.opcode == "QUERY")
    assert(d.rcode == "NOERROR")
    assert(d.qname.contains("www.example.com."))
    assert(d.qtype == 28)
    assert(d.qtypeStr.contains("AAAA"))
    assert(d.answer.isEmpty && d.authority.isEmpty && d.additional.isEmpty)
  }

  test("qname byte path escapes and lowercases like the RR name path") {
    // label bytes that hit all three emit branches: \ddd escapes
    // (0x07, 0xFF, space), \-escaped specials (. \ @), and A-Z lowercase
    val label = Array[Byte](7, 0xFF.toByte, ' ', '.', '\\', '@', 'A', 'Z', 'q')
    val msg = PcapSynth.be16(7) ++ PcapSynth.be16(0x0100) ++
      PcapSynth.be16(1) ++ PcapSynth.be16(0) ++ PcapSynth.be16(0) ++
      PcapSynth.be16(0) ++
      Array[Byte](label.length.toByte) ++ label ++
      Array[Byte](2) ++ "Io".getBytes ++ Array[Byte](0) ++
      PcapSynth.be16(16) ++ PcapSynth.be16(1)
    val d = DnsParser.parse(msg).get
    // the slow path's contract: readName + String.toLowerCase
    assert(d.qname.contains("\\007\\255\\032\\.\\\\\\@azq.io."))
    assert(d.qtypeStr.contains("TXT"))
  }

  test("garbage payload returns None (silent-drop parity)") {
    assert(DnsParser.parse(Array[Byte](1, 2, 3)).isEmpty)
    assert(DnsParser.parse(Array.fill[Byte](64)(-1)).isEmpty)
  }

  test("empty question section: qname absent, qtype 0") {
    // header only, all counts 0
    val msg = PcapSynth.be16(7) ++ PcapSynth.be16(0x8000) ++
      PcapSynth.be16(0) ++ PcapSynth.be16(0) ++ PcapSynth.be16(0) ++ PcapSynth.be16(0)
    val d = DnsParser.parse(msg).get
    assert(d.qname.isEmpty && d.qtype == 0 && d.qtypeStr.isEmpty)
    assert(d.qr && d.flags == "qr")
  }

  test("compression pointers resolve; pointer loops rejected") {
    // question: full name at offset 12; answer RR name: pointer to 12
    val msg = PcapSynth.be16(1) ++ PcapSynth.be16(0x8100) ++
      PcapSynth.be16(1) ++ PcapSynth.be16(1) ++
      PcapSynth.be16(0) ++ PcapSynth.be16(0) ++
      Array[Byte](3) ++ "www".getBytes ++
      Array[Byte](7) ++ "example".getBytes ++
      Array[Byte](3) ++ "com".getBytes ++ Array[Byte](0) ++
      PcapSynth.be16(1) ++ PcapSynth.be16(1) ++
      Array[Byte](0xC0.toByte, 12) ++ PcapSynth.be16(1) ++ PcapSynth.be16(1) ++
      Array[Byte](0, 0, 0, 60) ++ PcapSynth.be16(4) ++
      Array[Byte](1, 2, 3, 4)
    val d = DnsParser.parse(msg).get
    assert(d.qname.contains("www.example.com."))
    assert(d.answer == Seq("www.example.com. 60 IN A 1.2.3.4"))

    // self-pointing loop must fail, not hang
    val loop = PcapSynth.be16(1) ++ PcapSynth.be16(0x0100) ++
      PcapSynth.be16(1) ++ PcapSynth.be16(0) ++ PcapSynth.be16(0) ++
      PcapSynth.be16(0) ++ Array[Byte](0xC0.toByte, 12)
    assert(DnsParser.parse(loop ++ PcapSynth.be16(1) ++ PcapSynth.be16(1)).isEmpty)
  }

  test("OPT pseudo-record renders dnsjava-shaped string") {
    // OPT: name=root, type 41, class 4096 (payload), ttl 0x00008000
    val msg = PcapSynth.be16(9) ++ PcapSynth.be16(0x8000) ++
      PcapSynth.be16(0) ++ PcapSynth.be16(0) ++ PcapSynth.be16(0) ++
      PcapSynth.be16(1) ++
      Array[Byte](0) ++ PcapSynth.be16(41) ++ PcapSynth.be16(4096) ++
      Array[Byte](0, 0, 0x80.toByte, 0) ++ PcapSynth.be16(0)
    val d = DnsParser.parse(msg).get
    assert(d.additional == Seq(
      ". 32768 CLASS4096 OPT ; payload 4096, xrcode 0, version 0, flags 32768"))
  }

  test("TXT records quote strings; unknown types use RFC3597 form") {
    val txtRdata = Array[Byte](5) ++ "hello".getBytes
    val msg = PcapSynth.be16(9) ++ PcapSynth.be16(0x8000) ++
      PcapSynth.be16(0) ++ PcapSynth.be16(2) ++ PcapSynth.be16(0) ++
      PcapSynth.be16(0) ++
      // TXT
      Array[Byte](0) ++ PcapSynth.be16(16) ++ PcapSynth.be16(1) ++
      Array[Byte](0, 0, 0, 1) ++ PcapSynth.be16(txtRdata.length) ++ txtRdata ++
      // unknown type 999, 2 rdata bytes
      Array[Byte](0) ++ PcapSynth.be16(999) ++ PcapSynth.be16(1) ++
      Array[Byte](0, 0, 0, 1) ++ PcapSynth.be16(2) ++ Array[Byte](0xAB.toByte, 0xCD.toByte)
    val d = DnsParser.parse(msg).get
    assert(d.answer == Seq(
      ". 1 IN TXT \"hello\"",
      ". 1 IN TYPE999 \\# 2 ABCD"))
  }

  test("SOA, MX, SRV, AAAA rdata render canonically") {
    def rr(name: Array[Byte], t: Int, rdata: Array[Byte]): Array[Byte] =
      name ++ PcapSynth.be16(t) ++ PcapSynth.be16(1) ++
        Array[Byte](0, 0, 0, 10) ++ PcapSynth.be16(rdata.length) ++ rdata
    def n(labels: String*): Array[Byte] =
      labels.flatMap(l => Array(l.length.toByte) ++ l.getBytes).toArray ++
        Array[Byte](0)
    val soaRdata = n("ns1", "x") ++ n("admin", "x") ++
      Array[Byte](0, 0, 0, 1) ++ Array[Byte](0, 0, 0, 2) ++
      Array[Byte](0, 0, 0, 3) ++ Array[Byte](0, 0, 0, 4) ++
      Array[Byte](0, 0, 0, 5)
    val mxRdata = PcapSynth.be16(10) ++ n("mail", "x")
    val srvRdata = PcapSynth.be16(1) ++ PcapSynth.be16(2) ++
      PcapSynth.be16(8080) ++ n("svc", "x")
    val aaaaRdata = Array.tabulate[Byte](16)(i => if (i == 15) 1 else 0)
    val msg = PcapSynth.be16(1) ++ PcapSynth.be16(0x8000) ++
      PcapSynth.be16(0) ++ PcapSynth.be16(4) ++ PcapSynth.be16(0) ++
      PcapSynth.be16(0) ++
      rr(n("a"), 6, soaRdata) ++ rr(n("b"), 15, mxRdata) ++
      rr(n("c"), 33, srvRdata) ++ rr(n("d"), 28, aaaaRdata)
    val d = DnsParser.parse(msg).get
    assert(d.answer == Seq(
      "a. 10 IN SOA ns1.x. admin.x. 1 2 3 4 5",
      "b. 10 IN MX 10 mail.x.",
      "c. 10 IN SRV 1 2 8080 svc.x.",
      "d. 10 IN AAAA 0:0:0:0:0:0:0:1"))

    // section-pruned parse: identical header/question fields, empty
    // sections, and the SAME accept/reject decision on every input
    val p = DnsParser.parse(msg, 0, msg.length, emitSections = false).get
    assert(p.queryId == d.queryId && p.flags == d.flags &&
      p.qname == d.qname && p.qtype == d.qtype && p.rcode == d.rcode)
    assert(p.answer.isEmpty && p.authority.isEmpty && p.additional.isEmpty)
  }

  test("section pruning never changes which messages decode") {
    // well-formed with compression: both modes accept
    val ok = PcapSynth.be16(1) ++ PcapSynth.be16(0x8100) ++
      PcapSynth.be16(1) ++ PcapSynth.be16(1) ++
      PcapSynth.be16(0) ++ PcapSynth.be16(0) ++
      Array[Byte](3) ++ "www".getBytes ++
      Array[Byte](7) ++ "example".getBytes ++
      Array[Byte](3) ++ "com".getBytes ++ Array[Byte](0) ++
      PcapSynth.be16(1) ++ PcapSynth.be16(1) ++
      Array[Byte](0xC0.toByte, 12) ++ PcapSynth.be16(1) ++ PcapSynth.be16(1) ++
      Array[Byte](0, 0, 0, 60) ++ PcapSynth.be16(4) ++
      Array[Byte](1, 2, 3, 4)
    assert(DnsParser.parse(ok, 0, ok.length, emitSections = false)
      .get.qname.contains("www.example.com."))
    // corrupt variants must be rejected by BOTH modes (pruning must not
    // resurrect packets the full parse drops)
    val corrupt = Seq(
      ok.dropRight(3),                         // truncated rdata
      { val b = ok.clone()                     // answer-name pointer loop
        b(34) = 33; b },                       // C0 21: points at itself
      { val b = ok.clone()                     // rdlen overruns message
        b(ok.length - 6) = 0x7F; b })
    corrupt.foreach { m =>
      val full = DnsParser.parse(m, 0, m.length, emitSections = true)
      val pruned = DnsParser.parse(m, 0, m.length, emitSections = false)
      assert(full.isEmpty == pruned.isEmpty, m.toSeq.toString)
    }
    // seeded random corruption sweep: decisions always agree
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val m = ok.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      val full = DnsParser.parse(m, 0, m.length, emitSections = true)
      val pruned = DnsParser.parse(m, 0, m.length, emitSections = false)
      assert(full.isEmpty == pruned.isEmpty, m.toSeq.toString)
      if (full.nonEmpty)
        assert(full.get.qname == pruned.get.qname &&
          full.get.flags == pruned.get.flags)
    }
  }
}
