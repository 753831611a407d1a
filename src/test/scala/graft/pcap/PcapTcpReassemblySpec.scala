package graft.pcap

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** pcap_tcp_reassembly orders by the decoded `tcp_seq` column, so the
  * on-disk arrival order of segments must not matter. */
class PcapTcpReassemblySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def reassemble(path: String) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the production aggregator itself, not a copy — drift-proof
    spark.read.format("pcap").load(path)
      .filter($"protocol" === "TCP")
      .groupBy($"src", $"src_port")
      .agg(graft.functions.Reassemble.stream().as("r"))
      .select($"src", $"src_port", md5($"r.stream").as("h"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2))
      .toMap
  }

  test("segment arrival order does not change reassembled streams") {
    val segs = PcapSynth.tcpFlowSegments(40)
    val inOrder = java.nio.file.Files.createTempFile("tcp_in", ".pcap")
    PcapSynth.writeAtomic(inOrder, PcapSynth.file(segs))
    // adversarial order: reverse the whole capture (every flow's
    // segments arrive strictly backwards)
    val reversed = java.nio.file.Files.createTempFile("tcp_rev", ".pcap")
    PcapSynth.writeAtomic(reversed, PcapSynth.file(segs.reverse))
    // deterministic shuffle
    val rnd = new scala.util.Random(7)
    val shuffled = java.nio.file.Files.createTempFile("tcp_shuf", ".pcap")
    PcapSynth.writeAtomic(shuffled, PcapSynth.file(rnd.shuffle(segs)))

    val base = reassemble(inOrder.toString)
    assert(base.size == 40)
    assert(reassemble(reversed.toString) == base)
    assert(reassemble(shuffled.toString) == base)
    // and the streams really are the synthesized flow payloads
    val expected = (0 until 40).map { f =>
      val md = java.security.MessageDigest.getInstance("MD5")
      ("10.1." + (f >> 8) + "." + (f & 0xFF), 30000 + f) ->
        md.digest(PcapSynth.tcpFlowPayload(f))
          .map(b => f"${b & 0xFF}%02x").mkString
    }.toMap
    assert(base == expected)
  }

  test("exact retransmits keep the first capture copy") {
    val segs = PcapSynth.tcpFlowSegments(40)
    val clean = java.nio.file.Files.createTempFile("tcp_clean", ".pcap")
    PcapSynth.writeAtomic(clean, PcapSynth.file(segs))
    // retransmit every third segment: the duplicate lands later in the
    // capture (higher pkt_idx); a corrupted retransmit payload proves
    // the FIRST copy wins, not an arbitrary one
    val withDupes = segs.zipWithIndex.flatMap { case (s @ (ts, us, fr), i) =>
      if (i % 3 == 0) {
        val corrupted = fr.clone()
        corrupted(fr.length - 1) = (corrupted(fr.length - 1) ^ 0x5A).toByte
        Seq(s, (ts + 1, us, corrupted))
      } else Seq(s)
    }
    val dup = java.nio.file.Files.createTempFile("tcp_dup", ".pcap")
    PcapSynth.writeAtomic(dup, PcapSynth.file(withDupes))
    assert(reassemble(dup.toString) == reassemble(clean.toString))
  }
}
