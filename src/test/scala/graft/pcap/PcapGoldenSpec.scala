package graft.pcap

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end assertions for `spark.read.format("pcap")` on the
  * reference fixture (FIXTURES.md §2: 2 packets — a DNS A query for
  * ripe.net and its referral response). */
class PcapGoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val fixture = getClass.getResource("/test.pcap").getPath

  test("golden: both packets, all columns (decoder=dns, md5 on)") {
    val rows = spark.read.format("pcap")
      .option("decoder", "dns").option("md5", "true")
      .load(fixture)
      .orderBy("pkt_idx")
      .collect()
    assert(rows.length == 2)

    val q = rows(0) // query packet
    assert(q.getAs[Long]("ts") == 1317993942L)
    assert(q.getAs[Long]("ts_micro") == 1317993942105851L)
    assert(q.getAs[Long]("size") == 68L)
    assert(q.getAs[String]("ether_type") == "IPv4")
    assert(q.getAs[Int]("ttl") == 64)
    assert(q.getAs[String]("protocol") == "UDP")
    assert(q.getAs[String]("src") == "193.0.10.82")
    assert(q.getAs[String]("dst") == "193.0.14.129")
    assert(q.getAs[Int]("src_port") == 52938)
    assert(q.getAs[Int]("dst_port") == 53)
    assert(q.getAs[Int]("udpsum") == 0)
    assert(q.getAs[Int]("len") == 26)
    assert(q.isNullAt(q.fieldIndex("frag")))
    assert(q.isNullAt(q.fieldIndex("payload_len")))
    assert(q.isNullAt(q.fieldIndex("ext_count")))
    assert(q.isNullAt(q.fieldIndex("ext_headers")))
    assert(q.getAs[Int]("dns_queryid") == 49638)
    assert(q.getAs[String]("dns_flags") == "rd")
    assert(!q.getAs[Boolean]("dns_qr"))
    assert(q.getAs[String]("dns_opcode") == "QUERY")
    assert(q.getAs[String]("dns_rcode") == "NOERROR")
    assert(q.getAs[String]("dns_qname") == "ripe.net.")
    assert(q.getAs[Int]("dns_qtype") == 1)
    assert(q.getAs[String]("dns_qtype_str") == "A")
    assert(q.getSeq[String](q.fieldIndex("dns_answer")).isEmpty)
    assert(q.getSeq[String](q.fieldIndex("dns_authority")).isEmpty)
    assert(q.getSeq[String](q.fieldIndex("dns_additional")).isEmpty)
    assert(q.getAs[String]("md5").matches("[0-9A-F]{32}"))
    assert(q.getAs[Long]("pkt_idx") == 1L)

    val r = rows(1) // referral response
    assert(r.getAs[Long]("ts") == 1317993942L)
    assert(r.getAs[Long]("ts_micro") == 1317993942107792L)
    assert(r.getAs[Long]("size") == 553L)
    assert(r.getAs[Int]("ttl") == 62)
    assert(r.getAs[String]("src") == "193.0.14.129")
    assert(r.getAs[String]("dst") == "193.0.10.82")
    assert(r.getAs[Int]("src_port") == 53)
    assert(r.getAs[Int]("dst_port") == 52938)
    assert(r.getAs[Int]("udpsum") == 0)
    assert(r.getAs[Int]("len") == 511)
    assert(r.getAs[Int]("dns_queryid") == 49638)
    assert(r.getAs[String]("dns_flags") == "qr rd")
    assert(r.getAs[Boolean]("dns_qr"))
    assert(r.getAs[String]("dns_qname") == "ripe.net.")
    val auth = r.getSeq[String](r.fieldIndex("dns_authority"))
    assert(auth.length == 13)
    // referral NS set for the net. zone: a.–m.gtld-servers.net
    assert(auth.forall(_.matches(
      "net\\. 172800 IN NS [a-m]\\.gtld-servers\\.net\\.")))
    val add = r.getSeq[String](r.fieldIndex("dns_additional"))
    assert(add.length == 15)
    // glue set: 13 IPv4 + 2 IPv6 addresses (no OPT in this capture)
    assert(add.count(_.contains(" IN A ")) == 13)
    assert(add.count(_.contains(" IN AAAA ")) == 2)
  }

  test("column pruning reaches the decoder plan") {
    val df = spark.read.format("pcap").load(fixture)
      .select("src_port").where("dst_port = 53")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PcapScan"))
    // only the needed columns in the scan schema
    assert(df.count() == 1)
  }

  test("section-pruned projection matches the full decode (qname/qtype)") {
    // dns_answer/authority/additional unrequested -> the decoder skips RR
    // string building; the visible columns must be identical to a full
    // projection of the same fixture (13 NS + 15 glue records walked
    // either way)
    val full = spark.read.format("pcap").option("decoder", "dns")
      .load(fixture)
      // requesting dns_authority in the collected output forces the
      // full section decode (dropping it pre-collect would re-prune)
      .select("pkt_idx", "dns_qname", "dns_qtype_str", "dns_rcode",
        "dns_flags", "dns_authority")
      .collect().map(_.toSeq.take(5)).sortBy(_.head.asInstanceOf[Long])
    val pruned = spark.read.format("pcap").option("decoder", "dns")
      .load(fixture)
      .select("pkt_idx", "dns_qname", "dns_qtype_str", "dns_rcode", "dns_flags")
      .where("dns_qname is not null")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(full.filter(_(1) != null).toSeq == pruned.toSeq)
    assert(pruned.forall(_(1) == "ripe.net."))
  }

  test("reference canonical query: count by src_port") {
    val got = spark.read.format("pcap").load(fixture)
      .groupBy("src_port").count()
      .collect().map(r => r.getAs[Int]("src_port") -> r.getAs[Long]("count"))
      .toMap
    assert(got == Map(52938 -> 1L, 53 -> 1L))
  }

  test("decoder=ip leaves dns columns null") {
    val rows = spark.read.format("pcap").load(fixture).collect()
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("dns_queryid"))))
    // md5 off by default
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("md5"))))
  }

  test("gzipped pcap decodes transparently") {
    val tmp = java.nio.file.Files.createTempDirectory("pcapgz")
    val gz = tmp.resolve("test.pcap.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    out.write(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture)))
    out.close()
    val n = spark.read.format("pcap").load(gz.toString).count()
    assert(n == 2)
  }

  test("bzip2 pcap decodes transparently (Hadoop codec factory)") {
    val tmp = java.nio.file.Files.createTempDirectory("pcapbz2")
    val bz = tmp.resolve("test.pcap.bz2")
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(new org.apache.hadoop.conf.Configuration())
    val out = codec.createOutputStream(
      java.nio.file.Files.newOutputStream(bz))
    out.write(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture)))
    out.close()
    val rows = spark.read.format("pcap").option("decoder", "dns")
      .load(bz.toString).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("dns_qname") == "ripe.net."))
  }

  test("zstd pcap decodes transparently (zstd-jni streaming decoder)") {
    val tmp = java.nio.file.Files.createTempDirectory("pcapzst")
    val zst = tmp.resolve("test.pcap.zst")
    val out = new com.github.luben.zstd.ZstdOutputStream(
      java.nio.file.Files.newOutputStream(zst))
    out.write(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture)))
    out.close()
    val rows = spark.read.format("pcap").option("decoder", "dns")
      .load(zst.toString).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("dns_qname") == "ripe.net."))
  }

  test("pcapng file decodes through the Spark source (sniffed container)") {
    import graft.pcap.PcapSynth
    val tmp = java.nio.file.Files.createTempDirectory("pcapng")
    val dnsFrame = PcapSynth.ipv4UdpFrame(
      Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2),
      5353, 53, ttl = 64,
      payload = PcapSynth.dnsQuery(7, "ripe.net", qtype = 1))
    val ng = PcapSynth.fileNg(Seq(1),
      Seq((0, 1317993942L * 1000000L + 105851L, dnsFrame)))
    java.nio.file.Files.write(tmp.resolve("cap.pcapng"), ng)
    val row = spark.read.format("pcap").option("decoder", "dns")
      .load(tmp.toString)
      .selectExpr("ts", "dns_qname", "dst_port").collect()
    assert(row.length == 1)
    assert(row.head.getLong(0) == 1317993942L)
    assert(row.head.getString(1) == "ripe.net.")
    assert(row.head.getInt(2) == 53)
  }

  test("many-file directory scan bin-packs into few partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("pcapmany")
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    (1 to 20).foreach { i =>
      java.nio.file.Files.write(tmp.resolve(f"f$i%02d.pcap"), bytes)
    }
    // explicit 128 MB target = the million-file-lake packing shape
    val df = spark.read.format("pcap")
      .option("maxBytesPerPartition", "128m").load(tmp.toString)
    assert(df.count() == 40)
    assert(df.rdd.getNumPartitions == 1) // 20 tiny files pack into one task
    // the no-option default is scale-adaptive (BinPack.adaptiveTarget):
    // a tiny lake spreads toward cluster parallelism rather than
    // serializing the decode, bounded by one file per task
    val adaptive = spark.read.format("pcap").load(tmp.toString)
    assert(adaptive.count() == 40)
    assert(adaptive.rdd.getNumPartitions > 1 &&
      adaptive.rdd.getNumPartitions <= 20)
  }

  test("synthesized IPv6 pcap end-to-end through the Spark source") {
    val tmp = java.nio.file.Files.createTempDirectory("pcap_v6")
    val f = tmp.resolve("v6.pcap")
    java.nio.file.Files.write(f, PcapSynth.file(Seq(
      (10L, 500L, PcapSynth.ipv6UdpFrame(5353, 53, hopLimit = 7,
        payload = PcapSynth.dnsQuery(42, "v6.example.org", 28),
        withFragmentHeader = true)),
      (11L, 600L, PcapSynth.ipv6UdpFrame(40000, 9999, hopLimit = 3,
        payload = "plain".getBytes)))))
    val rows = spark.read.format("pcap").option("decoder", "dns")
      .load(f.toString).orderBy("pkt_idx").collect()
    assert(rows.length == 2)
    val a = rows(0)
    assert(a.getAs[String]("ether_type") == "IPv6")
    assert(a.getAs[Int]("ttl") == 7)
    assert(a.getAs[String]("protocol") == "UDP")
    assert(a.getAs[Boolean]("frag"))
    assert(a.getAs[Int]("ext_count") == 1)
    assert(a.getAs[String]("ext_headers") == "[Fragment][UDP]")
    assert(a.getAs[Int]("payload_len") > 0)
    assert(a.getAs[String]("src").contains(":"))
    assert(a.getAs[Int]("dns_queryid") == 42)
    assert(a.getAs[String]("dns_qname") == "v6.example.org.")
    assert(a.getAs[String]("dns_qtype_str") == "AAAA")
    val b = rows(1)
    assert(b.getAs[Int]("ttl") == 3)
    assert(b.isNullAt(b.fieldIndex("dns_queryid"))) // port != 53
    assert(b.getAs[Int]("len") == 5)
  }

  test("SLL link types (113/276): cooked headers unwrap to IP") {
    val src = Array[Byte](9, 8, 7, 6)
    val dst = Array[Byte](1, 2, 3, 4)
    val v1 = PcapSynth.sllUdpFrame(src, dst,
      srcPort = 1111, dstPort = 2222, ttl = 9, payload = "sll".getBytes)
    val v2 = PcapSynth.sll2UdpFrame(src, dst,
      srcPort = 3333, dstPort = 4444, ttl = 7, payload = "sll2!".getBytes)
    val tmp = java.nio.file.Files.createTempDirectory("pcap_sll")
    java.nio.file.Files.write(tmp.resolve("v1.pcap"),
      PcapSynth.file(Seq((1L, 0L, v1)), linkType = 113))
    java.nio.file.Files.write(tmp.resolve("v2.pcap"),
      PcapSynth.file(Seq((2L, 0L, v2)), linkType = 276))
    val rows = spark.read.format("pcap").load(tmp.toString)
      .collect().sortBy(_.getAs[Long]("ts"))
    assert(rows.length == 2)
    val a = rows(0)
    assert(a.getAs[String]("ether_type") == "IPv4") // SLL carries one
    assert(a.getAs[String]("src") == "9.8.7.6")
    assert(a.getAs[Int]("src_port") == 1111)
    assert(a.getAs[Int]("dst_port") == 2222)
    assert(a.getAs[Int]("len") == 3)
    val b = rows(1)
    assert(b.getAs[String]("ether_type") == "IPv4")
    assert(b.getAs[Int]("src_port") == 3333)
    assert(b.getAs[Int]("dst_port") == 4444)
    assert(b.getAs[Int]("ttl") == 7)
    assert(b.getAs[Int]("len") == 5)
  }

  test("RAW link type (101): IP starts at offset 0") {
    // strip the 14-byte Ethernet header off a v4 UDP frame
    val ether = PcapSynth.ipv4UdpFrame(
      Array[Byte](9, 8, 7, 6), Array[Byte](1, 2, 3, 4),
      srcPort = 1111, dstPort = 2222, ttl = 9, payload = "raw".getBytes)
    val rawFrame = ether.drop(14)
    val tmp = java.nio.file.Files.createTempDirectory("pcap_raw")
    val f = tmp.resolve("raw.pcap")
    java.nio.file.Files.write(f,
      PcapSynth.file(Seq((1L, 0L, rawFrame)), linkType = 101))
    val r = spark.read.format("pcap").load(f.toString).collect().head
    assert(r.getAs[String]("ether_type") == "") // non-Ethernet
    assert(r.getAs[String]("src") == "9.8.7.6")
    assert(r.getAs[Int]("src_port") == 1111)
    assert(r.getAs[Int]("len") == 3)
  }

  test("filters push into the decoder (and results stay correct)") {
    val df = spark.read.format("pcap").load(fixture)
      .where("dst_port = 53 AND ts >= 1317993942")
    val scanDesc = df.queryExecution.executedPlan
      .collectLeaves().head.toString
    assert(scanDesc.contains("EqualTo(dst_port,53)"))
    assert(scanDesc.contains("GreaterThanOrEqual(ts,1317993942)"))
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Int]("src_port") == 52938)
  }
}
