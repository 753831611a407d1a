package graft.tools

import org.apache.spark.sql.SparkSession

/** The BASELINE.md §"project proxy" measurement: decode throughput over a
  * ~1 GB generated capture (DNS-heavy + mixed-protocol synth frames),
  * local[32], whole-file-parallel via 32 equal chunk files. Prints MB/s
  * and packets/s for count-only and a 2-column DNS projection. */
object GigBench {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get("/tmp/graft_pcap_1g")
    if (!java.nio.file.Files.isDirectory(dir)) {
      java.nio.file.Files.createDirectories(dir)
      (0 until 32).foreach { i =>
        graft.pcap.PcapSynth.ensureFile(
          dir.resolve(f"part$i%02d.pcap"), 32L << 20)
      }
    }
    val totalMb = (0 until 32).map(i => java.nio.file.Files.size(
      dir.resolve(f"part$i%02d.pcap"))).sum / 1e6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional args: "row" forces the row path (A/B vs columnar default);
    // "bs=<n>" sets the columnar batch size
    val columnar = !args.contains("row")
    val batchSize = args.collectFirst {
      case a if a.startsWith("bs=") => a.stripPrefix("bs=")
    }.getOrElse("4096")
    def rd = spark.read.format("pcap").option("decoder", "dns")
      .option("columnar", columnar.toString)
      .option("columnarBatchSize", batchSize)
      .option("maxBytesPerPartition", "32m").load(dir.toString)
    def t(label: String)(f: => Long): Unit = {
      f // warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (sec, n) = samples.minBy(_._1)
      println(f"$label: ${totalMb / sec}%.0f MB/s, ${n / sec / 1e6}%.2f Mpkt/s ($sec%.2f s, $n pkts)")
    }
    t("1GB count-only      ")(rd.count())
    t("1GB qname+qtype agg ") {
      rd.filter("dns_qname is not null")
        .groupBy("dns_qtype_str").count().collect().map(_.getLong(1)).sum
    }
    spark.stop()
  }
}
