package graft.pcap

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The pcap WRITE path: SQL-filtered packets re-export as a valid
  * classic-libpcap capture (a capability the reference lacks — its
  * pipeline is strictly read-only). Round-trip contract: read -> filter
  * -> write -> read decodes the exact surviving packets. */
class PcapSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mixedCapture(): String = {
    val frames = (0 until 400).map(i =>
      (1700000000L + i, (i * 7L) % 1000000L, PcapSynth.synthFrame(i)))
    val tmp = java.nio.file.Files.createTempFile("sink_src", ".pcap")
    PcapSynth.writeAtomic(tmp, PcapSynth.file(frames))
    tmp.toString
  }

  test("filter -> write -> re-read round-trips the surviving packets") {
    val src = mixedCapture()
    val outDir = java.nio.file.Files.createTempDirectory("sink_out").toString

    val filtered = spark.read.format("pcap").option("decoder", "dns")
      .load(src)
      .filter("dst_port = 53 and dns_qname is not null")
      .select("ts_micro", "frame")
    filtered.write.format("pcap").mode("append").save(outDir)

    val expect = spark.read.format("pcap").option("decoder", "dns")
      .option("md5", "true").load(src)
      .filter("dst_port = 53 and dns_qname is not null")
      .select("ts_micro", "dns_qname", "src_port", "udpsum", "md5")
    val got = spark.read.format("pcap").option("decoder", "dns")
      .option("md5", "true").load(outDir)
      .select("ts_micro", "dns_qname", "src_port", "udpsum", "md5")

    val e = expect.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val g = got.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(e.length == 300 && g.length == e.length) // 6 of 8 synth slots are DNS
    assert(e.zip(g).forall { case (a, b) => a == b },
      "re-read packets differ from the filtered originals")
  }

  test("multi-partition export writes one valid file per non-empty task") {
    val src = mixedCapture()
    val outDir = java.nio.file.Files.createTempDirectory("sink_par").toString
    spark.read.format("pcap").load(src)
      .select("ts_micro", "frame")
      .repartition(3)
      .write.format("pcap").mode("append").save(outDir)
    val parts = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".pcap"))
    assert(parts.length == 3)
    assert(parts.forall(_.length() > 24))
    assert(!new java.io.File(outDir).listFiles()
      .exists(_.getName.endsWith(".inprogress")))
    val n = spark.read.format("pcap").load(outDir).count()
    assert(n == 400)
  }

  test("missing required columns fail fast at planning") {
    val src = mixedCapture()
    val outDir = java.nio.file.Files.createTempDirectory("sink_bad").toString
    val e = intercept[Exception] {
      spark.read.format("pcap").load(src)
        .select("ts_micro", "payload")
        .write.format("pcap").mode("append").save(outDir)
    }
    assert(e.getMessage.contains("frame"))
  }
}
