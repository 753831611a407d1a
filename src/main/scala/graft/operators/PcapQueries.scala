package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Queries over the `pcap` source itself (SURVEY.md §2A) — the reference's
  * own demonstrated workloads re-expressed on our DSv2 format. These have
  * no DuckDB oracle (DuckDB cannot read pcap), so the driver records the
  * weaker rows-only check; deep value assertions live in PcapGoldenSpec.
  *
  * Inputs are deterministic: the 2-packet reference fixture (in-repo) and
  * a synthesized DNS-heavy capture generated once into /tmp by
  * [[graft.pcap.PcapSynth.ensureFile]] (content is a pure function of
  * packet index).
  */
object PcapQueries {

  private val fixturePath = "/root/repo/src/test/resources/test.pcap"

  private def synthPath: String = {
    val p = java.nio.file.Paths.get("/tmp/graft_synth_32m.pcap")
    graft.pcap.PcapSynth.ensureFile(p, 32L << 20)
    p.toString
  }

  val defs: Seq[Q] = Seq(

    // the reference's canonical MR example: count by source port
    // (hadoop-pcap-lib/README.md:20-81)
    Q("pcap_port_histogram",
      (s, d) => {
        s.read.format("pcap").load(synthPath)
          .groupBy("dst_port")
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("dst_port"))
          .limit(50)
      }, None),

    // the Hive SerDe's documented DNS table workload
    // (hadoop-pcap-serde/README.md:25-60)
    Q("pcap_dns_qtype_agg",
      (s, d) => {
        import s.implicits._
        s.read.format("pcap").option("decoder", "dns").load(synthPath)
          .filter($"dns_qname".isNotNull)
          .groupBy($"dns_qtype_str")
          .agg(count(lit(1)).as("n"),
            countDistinct($"dns_qname").as("n_names"))
      }, None),

    // full-schema scan of the golden fixture (2 rows, all columns)
    Q("pcap_fixture_scan",
      (s, d) => {
        s.read.format("pcap")
          .option("decoder", "dns").option("md5", "true")
          .load(fixturePath)
          .drop("payload", "file") // unstable-across-hosts columns out
      }, None),

    // duplicate-packet detection — the motivation for the reference's MD5
    // conf flag (PcapReader.java:183 comment)
    Q("pcap_dedup_md5",
      (s, d) => {
        import s.implicits._
        s.read.format("pcap").option("md5", "true").load(synthPath)
          .groupBy($"md5")
          .agg(count(lit(1)).as("copies"))
          .filter($"copies" > 1)
          .agg(count(lit(1)).as("n_dup_groups"),
            coalesce(sum($"copies"), lit(0L)).as("n_dup_packets"))
      }, None),

    // protocol mix over the synthetic capture (exercises non-IP path)
    Q("pcap_protocol_mix",
      (s, d) => {
        import s.implicits._
        s.read.format("pcap").load(synthPath)
          .groupBy($"ether_type", $"protocol")
          .agg(count(lit(1)).as("n"),
            sum($"size").as("bytes"))
      }, None)
  )
}
