package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The corpus bridge's one-pass claim, asserted structurally: exactly
  * one pcap scan node in the physical plan (the two-direction + join
  * formulation planned two). */
class BridgePlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("pcap_http_to_corpus plans exactly one capture scan") {
    val df = SparkEntry.queries("pcap_http_to_corpus")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val scans = "PcapScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 pcap scan, found $scans:\n$plan")
    assert(df.count() > 0)
  }
}
