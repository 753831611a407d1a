package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput of the seq-ordered stream-reassembly shape at volume:
  * 200k interleaved TCP flows (~1M segments) across 16 capture files,
  * reassembled by the same bounded aggregator the pcap_tcp_reassembly
  * query uses (graft.functions.ReassembleAgg: sort + first-copy-wins
  * concat, capped per flow). Reports flows/s and MB/s over the decoded
  * segment bytes — the number that says whether the ONE-shuffle
  * reassembly shape holds up when the per-flow state is real. */
object ReassemblyBench {
  def main(args: Array[String]): Unit = {
    val nFlows = args.headOption.map(_.toInt).getOrElse(200000)
    // "skew" mode adds ONE elephant flow (20k segments x 1 kB = 20 MB
    // raw, ~1000x the median flow's bytes) — the adversarial shape the
    // bounded aggregator exists for. Its capped buffer (8 MB default)
    // keeps the hot task's state flat; the printed time characterizes
    // the residual single-key straggler.
    val skew = args.contains("skew")
    val nFiles = 16
    val dir = java.nio.file.Paths.get(
      s"/tmp/graft_reasm_$nFlows${if (skew) "_skew" else ""}")
    if (!java.nio.file.Files.isDirectory(dir)) {
      java.nio.file.Files.createDirectories(dir)
      val per = nFlows / nFiles
      (0 until nFiles).foreach { k =>
        // distinct flow id spaces per file via the flow index offset:
        // tcpFlowSegments is a pure function, so shift the port/address
        // space by writing different counts and interleaving files
        val segs = graft.pcap.PcapSynth.tcpFlowSegments(per).map {
          case (ts, us, fr) =>
            // re-home src to a per-file /16 so flows never collide
            val f2 = fr.clone()
            f2(27) = (k + 1).toByte // second byte of 10.x src address
            (ts, us, f2)
        }
        // elephant segments interleave across ALL files so every input
        // partition contributes compacted partials for the hot key
        val elephant = if (!skew) Seq.empty else
          (0 until 20000 / nFiles).map { j =>
            val i = k + j * nFiles
            val payload = Array.tabulate[Byte](1000)(b => ((i + b) % 251).toByte)
            (2000L + i, i.toLong, graft.pcap.PcapSynth.ipv4TcpFrame(
              src = Array[Byte](10, 99, 0, 1), dst = Array[Byte](10, 98, 0, 1),
              srcPort = 55555, dstPort = 80, ttl = 64, payload = payload,
              seq = 1000L + i.toLong * 1000, flags = 0x18))
          }
        graft.pcap.PcapSynth.writeAtomic(
          dir.resolve(f"part$k%02d.pcap"),
          graft.pcap.PcapSynth.file(segs ++ elephant))
      }
    }
    val totalMb = (0 until nFiles).map(i => java.nio.file.Files.size(
      dir.resolve(f"part$i%02d.pcap"))).sum / 1e6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def run(): (Long, Long) = {
      val df = spark.read.format("pcap")
        .option("maxBytesPerPartition", "8m")
        .load(dir.toString)
        .filter($"protocol" === "TCP")
        .groupBy($"src", $"dst", $"src_port", $"dst_port")
        // the exact aggregator the pcap_tcp_reassembly query ships —
        // shared so this bench can never drift from what production runs
        .agg(graft.functions.Reassemble.stream().as("r"))
        .agg(count(lit(1)), sum(length($"r.stream")))
      val r = df.head()
      (r.getLong(0), r.getLong(1))
    }
    run() // warm
    val t0 = System.nanoTime()
    val (flows, bytes) = run()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"reassembly: $flows%d flows, ${bytes / 1e6}%.1f MB streams, " +
      f"$totalMb%.0f MB capture in $sec%.2f s -> " +
      f"${flows / sec}%.0f flows/s, ${totalMb / sec}%.0f MB/s")
    spark.stop()
  }
}
