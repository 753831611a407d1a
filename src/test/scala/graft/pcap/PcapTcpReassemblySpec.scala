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
    spark.read.format("pcap").load(path)
      .filter($"protocol" === "TCP")
      .groupBy($"src", $"src_port")
      .agg(expr(
        "aggregate(array_sort(collect_list(struct(tcp_seq, payload))), " +
          "X'', (acc, x) -> concat(acc, x.payload))").as("stream"))
      .select($"src", $"src_port", md5($"stream").as("h"))
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
}
