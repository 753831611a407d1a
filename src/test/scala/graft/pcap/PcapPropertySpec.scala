package graft.pcap

import java.io.ByteArrayInputStream

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the robustness contract (SURVEY.md §1.3/§5):
  * the decoder must never throw on arbitrary packet bytes after a valid
  * global header — truncated, garbage, or adversarial frames produce
  * partial records, not exceptions. Deterministic seeded generation (the
  * scalatest/scalacheck bridge isn't in the offline artifact cache). */
class PcapPropertySpec extends AnyFunSuite {

  private val rnd = new Random(42)
  private val linkTypes = Seq(0, 1, 101, 108)

  private def randomFrame(): Array[Byte] = {
    val n = rnd.nextInt(257)
    val b = new Array[Byte](n)
    rnd.nextBytes(b)
    b
  }

  test("decode never throws on arbitrary frames (any link type)") {
    (1 to 200).foreach { _ =>
      val lt = linkTypes(rnd.nextInt(linkTypes.length))
      val frames = List.fill(1 + rnd.nextInt(8))(randomFrame())
      val bytes = PcapSynth.file(
        frames.zipWithIndex.map { case (f, i) => (i.toLong, i.toLong, f) },
        linkType = lt)
      val reader = new PcapStreamReader(new ByteArrayInputStream(bytes),
        DecodeOptions.dns.copy(md5 = true, keepPayload = true))
      val records = reader.toList
      assert(records.length == frames.length)
      assert(records.forall(_.ts.isDefined))
    }
  }

  test("decode never throws on random stream truncation") {
    val full = PcapSynth.file(Seq(
      (1L, 2L, PcapSynth.ipv4UdpFrame(
        Array[Byte](1, 2, 3, 4), Array[Byte](5, 6, 7, 8), 1000, 53, 60,
        PcapSynth.dnsQuery(7, "a.example.com"))),
      (2L, 3L, PcapSynth.synthFrame(3))))
    (0 to full.length).foreach { cut =>
      val cutBytes = full.take(cut)
      if (cutBytes.length < 24) {
        // header incomplete: empty-stream contract or IOException, no crash
        try new PcapStreamReader(new ByteArrayInputStream(cutBytes)).toList
        catch { case _: java.io.IOException => () }
      } else {
        val r = new PcapStreamReader(new ByteArrayInputStream(cutBytes),
          DecodeOptions.dns)
        r.toList.foreach(rec => assert(rec.ts.isDefined))
      }
    }
  }

  test("DNS parser never throws on arbitrary payloads") {
    (1 to 500).foreach { _ =>
      DnsParser.parse(randomFrame()) // must return, never throw
    }
  }

  test("DNS parser never throws on bit-flipped valid messages") {
    val base = PcapSynth.dnsQuery(0xBEEF, "www.example.com", 1)
    (1 to 300).foreach { _ =>
      val mutated = base.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      DnsParser.parse(mutated)
    }
  }

  test("valid synthetic DNS queries always parse") {
    (1 to 100).foreach { _ =>
      val id = rnd.nextInt(0x10000)
      val n = rnd.nextInt(100000)
      val d = DnsParser.parse(PcapSynth.dnsQuery(id, s"h$n.example.com"))
      assert(d.exists(f => f.queryId == id &&
        f.qname.contains(s"h$n.example.com.")))
    }
  }
}
