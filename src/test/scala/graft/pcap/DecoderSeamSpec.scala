package graft.pcap

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end test of the ServiceLoader decoder seam: a third-party
  * [[MdnsPayloadDecoder]] (registered via the provider file under
  * src/test/resources/META-INF/services) resolves through the Spark
  * source option `decoder=mdns`, exactly how the reference lets users
  * point `net.ripe.hadoop.pcap.io.reader.class` at their own subclass. */
class DecoderSeamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mdnsPcap(): String = {
    val frame = PcapSynth.ipv4UdpFrame(
      Array[Byte](10, 0, 0, 1), Array[Byte](224.toByte, 0, 0, 251.toByte),
      5353, 5353, ttl = 255,
      payload = PcapSynth.dnsQuery(7, "printer.local", qtype = 12))
    val tmp = java.nio.file.Files.createTempFile("mdns", ".pcap")
    java.nio.file.Files.write(tmp,
      PcapSynth.file(Seq((1700000000L, 0L, frame))))
    tmp.toString
  }

  test("ServiceLoader-registered decoder resolves by name and decodes") {
    val path = mdnsPcap()
    // shipped decoder ignores port 5353
    val shipped = spark.read.format("pcap").option("decoder", "dns")
      .load(path).select("dns_qname").collect()
    assert(shipped.forall(_.isNullAt(0)))
    // third-party decoder picks it up
    val mdns = spark.read.format("pcap").option("decoder", "mdns")
      .load(path).select("dns_qname", "dns_qtype_str").collect()
    assert(mdns.length == 1)
    assert(mdns.head.getString(0) == "printer.local.")
    assert(mdns.head.getString(1) == "PTR")
  }

  test("unknown decoder name fails fast with the available list") {
    val path = mdnsPcap()
    val e = intercept[IllegalArgumentException] {
      spark.read.format("pcap").option("decoder", "nosuch").load(path)
        .collect()
    }
    assert(e.getMessage.contains("nosuch"))
    assert(e.getMessage.contains("mdns")) // discovered via ServiceLoader
  }
}
