package graft.pcap

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Schema-driven decode pruning (udpsum / src,dst strings / ext_headers)
  * must be invisible in results: a pruned projection returns exactly the
  * columns an unpruned full-schema read returns, and residual filters on
  * a column that is NOT in the output projection still see its value
  * (Spark keeps filter-referenced columns in the required schema).
  */
class PrunedDecodeParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Mixed capture: v4 DNS + plain-UDP + ARP (synthFrame mix) plus two
    * hand-built v6 frames (one with a fragment ext header) so every
    * pruned field (udpsum, src/dst v4+v6, ext_headers) is exercised. */
  private lazy val capture: String = {
    val frames =
      (0 until 2000).map(i =>
        (1700000000L + i, i.toLong % 1000000L, PcapSynth.synthFrame(i))) ++
      Seq(
        (1700002000L, 0L, PcapSynth.ipv6UdpFrame(4242, 53, hopLimit = 61,
          payload = PcapSynth.dnsQuery(9, "v6.example.com", qtype = 28))),
        (1700002001L, 0L, PcapSynth.ipv6UdpFrame(4243, 9999, hopLimit = 7,
          payload = new Array[Byte](40), withFragmentHeader = true)))
    val tmp = java.nio.file.Files.createTempFile("pruneparity", ".pcap")
    PcapSynth.writeAtomic(tmp, PcapSynth.file(frames))
    tmp.toString
  }

  private val probeCols =
    Seq("pkt_idx", "udpsum", "src", "dst", "ext_headers", "ext_count",
      "dns_qname", "dns_qtype_str", "len", "frag")

  /** Ground truth: every column requested → nothing is pruned. */
  private lazy val fullRows: Map[Long, Seq[Any]] = {
    val all = graft.sources.pcap.PcapSchema.full.fieldNames
    spark.read.format("pcap").load(capture).select(all.head, all.tail: _*)
      .collect()
      .map { r =>
        r.getLong(all.indexOf("pkt_idx")) ->
          probeCols.map(c => r.get(all.indexOf(c)))
      }.toMap
  }

  test("each pruned-column projection matches the unpruned read") {
    // projections chosen so the decoder prunes a different combination
    // of (udpsum, addrStrings, extHeaderStrings) each time
    val projections = Seq(
      Seq("pkt_idx", "dns_qname", "dns_qtype_str"), // all three pruned
      Seq("pkt_idx", "udpsum", "len"),              // addrs+ext pruned
      Seq("pkt_idx", "src", "dst", "frag"),         // udpsum+ext pruned
      Seq("pkt_idx", "ext_headers", "ext_count"))   // udpsum+addrs pruned
    for (cols <- projections; columnar <- Seq(true, false)) {
      val got = spark.read.format("pcap")
        .option("columnar", columnar.toString).load(capture)
        .select(cols.head, cols.tail: _*).collect()
      assert(got.length == fullRows.size, s"$cols columnar=$columnar")
      got.foreach { r =>
        val idx = r.getLong(0)
        val want = cols.map(c => fullRows(idx)(probeCols.indexOf(c)))
        val have = cols.indices.map(r.get)
        assert(have == want,
          s"pkt $idx cols=$cols columnar=$columnar: $have != $want")
      }
    }
  }

  test("residual filter on a column outside the projection still works") {
    // src is pruned from the OUTPUT projection but referenced by the
    // filter — Spark's required schema keeps it, so the decoder must
    // still format address strings
    val qnames = spark.read.format("pcap").load(capture)
      .filter("src = '10.0.0.16'").select("dns_qname").collect()
      .map(_.getString(0)).toSeq
    val expect = fullRows.values.toSeq
      .filter(v => v(probeCols.indexOf("src")) == "10.0.0.16")
      .map(v => v(probeCols.indexOf("dns_qname")))
    assert(qnames.nonEmpty && qnames.sorted == expect.map(
      _.asInstanceOf[String]).sorted)

    // same for udpsum: filter IS NOT NULL + equality while projecting
    // only ports
    val n = spark.read.format("pcap").load(capture)
      .filter("udpsum = 0").select("dst_port").count()
    val expectN = fullRows.values.count(v =>
      v(probeCols.indexOf("udpsum")) == 0)
    assert(n == expectN && n > 0)
  }
}
