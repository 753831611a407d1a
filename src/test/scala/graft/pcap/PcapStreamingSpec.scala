package graft.pcap

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `readStream.format("pcap")` over a landing directory: newly-landed
  * capture files arrive as micro-batches. */
class PcapStreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("landing directory streams files incrementally") {
    val dir = Files.createTempDirectory("pcap_landing")
    val fixture = java.nio.file.Paths.get(
      getClass.getResource("/test.pcap").getPath)

    val stream = spark.readStream.format("pcap")
      .option("decoder", "dns")
      .load(dir.toString)
      .groupBy("dst_port").count()

    val query = stream.writeStream.format("memory")
      .queryName("pcap_stream_out").outputMode("complete").start()
    try {
      query.processAllAvailable()
      assert(spark.table("pcap_stream_out").count() == 0)

      Files.copy(fixture, dir.resolve("cap1.pcap"))
      query.processAllAvailable()
      val afterOne = spark.table("pcap_stream_out").collect()
        .map(r => r.getAs[Int]("dst_port") -> r.getAs[Long]("count")).toMap
      assert(afterOne == Map(53 -> 1L, 52938 -> 1L))

      Files.copy(fixture, dir.resolve("cap2.pcap"))
      query.processAllAvailable()
      val afterTwo = spark.table("pcap_stream_out").collect()
        .map(r => r.getAs[Int]("dst_port") -> r.getAs[Long]("count")).toMap
      assert(afterTwo == Map(53 -> 2L, 52938 -> 2L))
    } finally query.stop()
  }

  test("mixed classic + pcapng files stream from one landing directory") {
    val dir = Files.createTempDirectory("pcap_landing_mixed")
    val frame = graft.pcap.PcapSynth.ipv4UdpFrame(
      Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2),
      4000, 5000, ttl = 64, payload = new Array[Byte](8))
    val stream = spark.readStream.format("pcap").load(dir.toString)
      .groupBy("dst_port").count()
    val query = stream.writeStream.format("memory")
      .queryName("pcap_mixed_out").outputMode("complete").start()
    try {
      Files.write(dir.resolve("a.pcap"),
        graft.pcap.PcapSynth.file(Seq((1L, 0L, frame))))
      Files.write(dir.resolve("b.pcapng"),
        graft.pcap.PcapSynth.fileNg(Seq(1), Seq((0, 1000000L, frame))))
      query.processAllAvailable()
      val got = spark.table("pcap_mixed_out").collect()
        .map(r => r.getAs[Int]("dst_port") -> r.getAs[Long]("count")).toMap
      assert(got == Map(5000 -> 2L))
    } finally query.stop()
  }

  test("streamed dns columns decode like batch") {
    val dir = Files.createTempDirectory("pcap_landing2")
    val fixture = java.nio.file.Paths.get(
      getClass.getResource("/test.pcap").getPath)
    Files.copy(fixture, dir.resolve("cap.pcap"))

    val query = spark.readStream.format("pcap")
      .option("decoder", "dns")
      .load(dir.toString)
      .select("dns_qname", "dns_qr")
      .writeStream.format("memory")
      .queryName("pcap_stream_dns").outputMode("append").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("pcap_stream_dns").collect()
      assert(rows.length == 2)
      assert(rows.forall(_.getString(0) == "ripe.net."))
      assert(rows.map(_.getBoolean(1)).sorted.toSeq == Seq(false, true))
    } finally query.stop()
  }
}
