package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.sources.pcap.{PcapFileOpener, PcapTsIndex}

/** ETL-side sidecar generator: writes an exact `.tsidx` (minTs maxTs)
  * next to every classic-pcap capture under a directory, enabling
  * file-level ts pruning in the `pcap` source without opening files at
  * query time. One sequential header-walk per capture (bodies skipped;
  * compressed files stream through their codec) — the kind of pass a
  * landing-zone ETL runs once per arriving file.
  *
  * Usage: PcapStatsWriter <dirOrFile> [dirOrFile...]
  */
object PcapStatsWriter {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PcapStatsWriter <dirOrFile>...")
    val conf = new Configuration()
    args.foreach { a =>
      val p = new Path(a)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).toSeq.filter(_.isFile)
            .filterNot(st => st.getPath.getName.startsWith("_") ||
              PcapTsIndex.isSidecar(st.getPath.getName) ||
              st.getPath.getName.endsWith(".tmp"))
        else Seq(fs.getFileStatus(p))
      files.foreach { st =>
        val in = PcapFileOpener.open(conf, st.getPath.toString)
        val stats = try PcapTsIndex.scanMinMax(in) finally in.close()
        // non-classic containers (pcapng) have no fixed record chain for
        // the header walk — fall back to a full decode pass for the same
        // exact stats (slower, still one-time ETL work). The count
        // covers EVERY packet (also ones without a usable ts).
        val resolved = stats.orElse {
          val in2 = PcapFileOpener.open(conf, st.getPath.toString)
          try {
            var mn = Long.MaxValue
            var mx = Long.MinValue
            var n = 0L
            graft.pcap.PacketReaders
              .open(in2, graft.pcap.DecodeOptions(appDecoder = None))
              .foreach { p =>
                n += 1
                p.ts.foreach { t =>
                  if (t < mn) mn = t; if (t > mx) mx = t
                }
              }
            if (n == 0 || mn == Long.MaxValue) None
            else Some((mn, mx, n))
          } catch { case _: Exception => None } finally in2.close()
        }
        resolved match {
          case Some((mn, mx, n)) =>
            PcapTsIndex.writeSidecar(fs, st.getPath, mn, mx, Some(n))
            println(s"${st.getPath}: ts [$mn, $mx], $n packets")
          case None =>
            println(s"${st.getPath}: no packet stats (skipped)")
        }
      }
    }
  }
}
