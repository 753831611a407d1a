package graft.pcap

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only COUNT(*) over an indexed capture directory (round-9):
  * when every file has a count-bearing `.tsidx` sidecar the plan is a
  * PcapCountScan that never opens a capture; any missing/old sidecar,
  * a filter, or `countPushdown=false` falls back to the real scan with
  * identical results. */
class PcapCountPushdownSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** A directory of three small captures with distinct packet counts. */
  private def mkDir(): (String, Long) = {
    val dir = Files.createTempDirectory("pcap_cnt")
    var total = 0L
    for ((n, i) <- Seq(7, 11, 13).zipWithIndex) {
      val pkts = PcapSynth.icmpPackets(n)
      PcapSynth.writeAtomic(dir.resolve(s"cap$i.pcap"),
        PcapSynth.file(pkts))
      total += pkts.length
    }
    (dir.toString, total)
  }

  private def indexDir(d: String): Unit =
    graft.tools.PcapStatsWriter.main(Array(d))

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("indexed dir answers count(*) from sidecars without opening files") {
    val (d, total) = mkDir()
    indexDir(d)
    val df = spark.read.format("pcap").load(d).groupBy().count()
    assert(planOf(df).contains("PcapCountScan"),
      s"expected metadata count scan in:\n${planOf(df)}")
    assert(df.collect().head.getLong(0) == total)
    // parity: pushdown disabled must produce the same number the slow way
    val slow = spark.read.format("pcap").option("countPushdown", "false")
      .load(d).groupBy().count()
    assert(!planOf(slow).contains("PcapCountScan"))
    assert(slow.collect().head.getLong(0) == total)
  }

  test("missing or count-less sidecar falls back to the scan") {
    val (d, total) = mkDir()
    indexDir(d)
    // one sidecar loses its count field (pre-round-9 format)
    val p = java.nio.file.Paths.get(d, "cap1.pcap.tsidx")
    val twoField = new String(Files.readAllBytes(p), "UTF-8")
      .trim.split("\\s+").take(2).mkString(" ") + "\n"
    Files.write(p, twoField.getBytes("UTF-8"))
    // drop the Hadoop LocalFS checksum so the reader parses the
    // rewritten 2-field sidecar instead of tripping on a stale .crc
    Files.deleteIfExists(java.nio.file.Paths.get(d, ".cap1.pcap.tsidx.crc"))
    val df = spark.read.format("pcap").load(d).groupBy().count()
    assert(!planOf(df).contains("PcapCountScan"),
      "a count-less sidecar must decline the pushdown")
    assert(df.collect().head.getLong(0) == total)
    // sidecar missing entirely
    Files.delete(p)
    val df2 = spark.read.format("pcap").load(d).groupBy().count()
    assert(!planOf(df2).contains("PcapCountScan"))
    assert(df2.collect().head.getLong(0) == total)
  }

  test("filtered count never uses the metadata path") {
    val (d, _) = mkDir()
    indexDir(d)
    val df = spark.read.format("pcap").load(d)
      .filter("protocol = 'ICMP'").groupBy().count()
    assert(!planOf(df).contains("PcapCountScan"),
      "a filter must force the decoding scan (filters are residual)")
    assert(df.collect().head.getLong(0) > 0)
  }

  test("sink-written sidecars carry counts the pushdown can use") {
    val (d, total) = mkDir()
    val out = Files.createTempDirectory("pcap_cnt_out").toString + "/re"
    spark.read.format("pcap").load(d)
      .selectExpr("ts_micro", "frame")
      .repartition(2)
      .write.format("pcap").option("writeTsIndex", "true")
      .mode("append").save(out)
    val df = spark.read.format("pcap").load(out).groupBy().count()
    assert(planOf(df).contains("PcapCountScan"),
      s"sink sidecars must enable the pushdown:\n${planOf(df)}")
    assert(df.collect().head.getLong(0) == total)
  }
}
