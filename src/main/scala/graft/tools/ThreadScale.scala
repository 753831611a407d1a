package graft.tools
import graft.pcap._

/** Scratch: raw decoder thread-scaling without Spark. */
object ThreadScale {
  def main(args: Array[String]): Unit = {
    val p = java.nio.file.Paths.get("/tmp/graft_synth_32m.pcap")
    PcapSynth.ensureFile(p, 32L << 20)
    val bytes = java.nio.file.Files.readAllBytes(p)
    def decodeOnce(): Long = {
      val r = new PcapStreamReader(new java.io.ByteArrayInputStream(bytes),
        DecodeOptions.dns)
      var n = 0L
      while (r.hasNext) { r.next(); n += 1 }
      n
    }
    decodeOnce(); decodeOnce() // JIT warm
    for (nt <- Seq(1, 4, 8, 16, 32)) {
      val t0 = System.nanoTime()
      val threads = (1 to nt).map { _ =>
        val t = new Thread(() => { decodeOnce(); () })
        t.start(); t
      }
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = bytes.length / 1e6 * nt
      println(f"threads=$nt%2d: $sec%5.2f s aggregate ${mb / sec}%6.0f MB/s  per-thread ${mb / sec / nt}%5.0f MB/s")
    }
  }
}
