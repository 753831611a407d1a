package graft.tools
import graft.pcap._
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val p = java.nio.file.Paths.get("/tmp/graft_synth_32m.pcap")
    PcapSynth.ensureFile(p, 32L << 20)
    val bytes = java.nio.file.Files.readAllBytes(p)
    // "pruned" arg: the telemetry-projection decode shape (qname/qtype
    // only — no sections, checksum, addresses, or ext-header strings)
    val opts =
      if (args.contains("pruned"))
        DecodeOptions.dns.copy(dnsSections = false, udpsum = false,
          addrStrings = false, extHeaderStrings = false)
      else DecodeOptions.dns
    for (round <- 1 to 4) {
      val t0 = System.nanoTime()
      var n = 0L
      val r = new PcapStreamReader(new java.io.ByteArrayInputStream(bytes),
        opts)
      while (r.hasNext) { r.next(); n += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"round $round: $n pkts in $sec%.2f s = ${bytes.length / 1e6 / sec}%.1f MB/s, ${n / sec / 1000}%.0f kpkt/s")
    }
  }
}
