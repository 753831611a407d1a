package graft.pcap

import org.scalatest.funsuite.AnyFunSuite

/** 802.1Q tag decode (vlan_id / vlan_pcp — superset columns; the
  * reference unwraps one tag to find IP but discards the TCI,
  * PcapReader.java:283-303). Contract under test: the TCI splits into
  * the 12-bit vid and 3-bit PCP; untagged frames, non-Ethernet links,
  * and frames truncated inside the tag all leave both columns NULL —
  * and the IP layer behind the tag still decodes. */
class VlanDecodeSpec extends AnyFunSuite {

  private val a = Array[Byte](10, 0, 0, 1)
  private val b = Array[Byte](10, 0, 0, 2)

  private def plainFrame: Array[Byte] =
    PcapSynth.ipv4UdpFrame(a, b, 1111, 53, ttl = 64,
      payload = PcapSynth.dnsQuery(7, "x.example.com"))

  private def tagged(tci: Int): Array[Byte] =
    plainFrame.take(12) ++ PcapSynth.be16(0x8100) ++
      PcapSynth.be16(tci) ++ plainFrame.drop(12)

  private def decodeOne(frame: Array[Byte],
      linkType: Int = 1): PacketRecord = {
    val r = new PcapStreamReader(new java.io.ByteArrayInputStream(
      PcapSynth.file(Seq((1L, 0L, frame)), linkType)), DecodeOptions())
    r.next()
  }

  test("TCI splits into vid and pcp; IP behind the tag still decodes") {
    val r = new PcapStreamReader(new java.io.ByteArrayInputStream(
      PcapSynth.file(Seq((1L, 0L, tagged((5 << 13) | 0xABC))))),
      DecodeOptions.dns).next()
    assert(r.vlanId.contains(0xABC))
    assert(r.vlanPcp.contains(5))
    assert(r.protocol.contains("UDP"))
    assert(r.dns.flatMap(_.qname).contains("x.example.com."))
  }

  test("vid 0 (priority-tagged) and pcp 0 decode as Some(0), not NULL") {
    val r = decodeOne(tagged(0))
    assert(r.vlanId.contains(0))
    assert(r.vlanPcp.contains(0))
  }

  test("untagged Ethernet frame: both columns NULL, decode unchanged") {
    val r = decodeOne(plainFrame)
    assert(r.vlanId.isEmpty && r.vlanPcp.isEmpty)
    assert(r.protocol.contains("UDP"))
  }

  test("frame truncated inside the tag leaves the columns NULL") {
    val cut = tagged((3 << 13) | 42).take(17) // ends mid-TCI
    val r = decodeOne(cut)
    assert(r.vlanId.isEmpty && r.vlanPcp.isEmpty)
    assert(r.protocol.isEmpty)
  }

  test("SLL frames never get a vlan id (Ethernet-only branch)") {
    val r = decodeOne(PcapSynth.sllUdpFrame(a, b, 1111, 53, ttl = 64,
      payload = PcapSynth.dnsQuery(8, "y.example.com")), linkType = 113)
    assert(r.vlanId.isEmpty && r.vlanPcp.isEmpty)
    assert(r.protocol.contains("UDP"))
  }

  test("QinQ: outer service TCI + inner customer vid; IP still decodes") {
    val qinq = plainFrame.take(12) ++ PcapSynth.be16(0x88A8) ++
      PcapSynth.be16((2 << 13) | 200) ++ PcapSynth.be16(0x8100) ++
      PcapSynth.be16(305) ++ plainFrame.drop(12)
    val r = decodeOne(qinq)
    assert(r.vlanId.contains(200) && r.vlanPcp.contains(2))
    assert(r.vlanInnerId.contains(305))
    assert(r.protocol.contains("UDP"))
  }

  test("legacy double-0x8100 stacking also yields the inner vid") {
    val dd = plainFrame.take(12) ++ PcapSynth.be16(0x8100) ++
      PcapSynth.be16(7) ++ PcapSynth.be16(0x8100) ++
      PcapSynth.be16(9) ++ plainFrame.drop(12)
    val r = decodeOne(dd)
    assert(r.vlanId.contains(7) && r.vlanInnerId.contains(9))
    assert(r.protocol.contains("UDP"))
  }

  test("single-tagged frame leaves vlan_inner_id NULL") {
    val r = decodeOne(tagged(42))
    assert(r.vlanId.contains(42) && r.vlanInnerId.isEmpty)
  }

  test("triple-tagged frame does NOT decode IP (two-tag unwrap bound)") {
    val ttt = plainFrame.take(12) ++ PcapSynth.be16(0x88A8) ++
      PcapSynth.be16(1) ++ PcapSynth.be16(0x88A8) ++
      PcapSynth.be16(2) ++ PcapSynth.be16(0x8100) ++
      PcapSynth.be16(3) ++ plainFrame.drop(12)
    val r = decodeOne(ttt)
    assert(r.vlanId.contains(1) && r.vlanInnerId.contains(2))
    assert(r.protocol.isEmpty) // bounded unwrap: no IP hunt past 2 tags
  }

  test("fixture inventory: per-vid counts match the synthesis formulas") {
    val recs = new PcapStreamReader(new java.io.ByteArrayInputStream(
      PcapSynth.file(PcapSynth.vlanPackets(120))), DecodeOptions()).toVector
    assert(recs.size == 120)
    val untagged = recs.count(_.vlanId.isEmpty)
    assert(untagged == (0 until 120).count(_ % 10 == 7))
    val byVid = recs.flatMap(r => r.vlanId.map(_ -> r)).groupBy(_._1)
    assert(byVid.keySet == (100 to 105).toSet)
    for (k <- 0 until 6) {
      val expect = (0 until 120).filter(i => i % 10 != 7 && i % 6 == k)
      val got = byVid(100 + k).map(_._2)
      assert(got.size == expect.size)
      assert(got.flatMap(_.vlanPcp).max == expect.map(_ % 8).max)
    }
  }
}
