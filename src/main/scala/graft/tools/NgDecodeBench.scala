package graft.tools
import graft.pcap._

/** Scratch: pcapng vs classic decode throughput, same frames. */
object NgDecodeBench {
  def main(args: Array[String]): Unit = {
    val n = 200000
    val frames = (0 until n).map(PcapSynth.synthFrame)
    val classic = PcapSynth.file(
      frames.zipWithIndex.map { case (f, i) => (i.toLong, 0L, f) })
    val ng = PcapSynth.fileNg(Seq(1),
      frames.zipWithIndex.map { case (f, i) => (0, i.toLong * 1000000L, f) })
    def time(bytes: Array[Byte]): Double = {
      val t0 = System.nanoTime()
      val r = PacketReaders.open(
        new java.io.ByteArrayInputStream(bytes), DecodeOptions.dns)
      var c = 0
      while (r.hasNext) { r.next(); c += 1 }
      assert(c == n)
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 2).foreach { _ => time(classic); time(ng) } // warm
    val tc = (1 to 3).map(_ => time(classic)).min
    val tn = (1 to 3).map(_ => time(ng)).min
    println(f"classic: $tc%.3f s (${classic.length / 1e6 / tc}%.0f MB/s)  " +
      f"pcapng: $tn%.3f s (${ng.length / 1e6 / tn}%.0f MB/s)  ratio ${tn / tc}%.2f")
  }
}
