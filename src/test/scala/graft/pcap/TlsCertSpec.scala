package graft.pcap

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TlsCertParse

/** Structural gates for the passive X.509 inventory
  * (`pcap_tls_certs`) beyond the DuckDB hash match and the Python
  * byte-level re-derivation: the parser takes the LEAF of a chain,
  * returns null (never throws) on truncations/garbage/mid-stream
  * suffixes, the self-signed/expired populations are the intended
  * ones, and the plan keeps the reassembly + rollup shape. */
class TlsCertSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def run(name: String) =
    graft.operators.PcapQueries.defs.find(_.name == name).get
      .fn(spark, "unused")

  test("flight parse: every population yields the leaf certificate's " +
      "fields, not the CA stub riding second in the chain") {
    for (i <- 0 until 10) {
      val k = i % 5
      val row = TlsCertParse.parse(PcapSynth.tlsCertFlight(i))
      assert(row != null, s"session $i")
      assert(row.getLong(0) == PcapSynth.certSerial(k))
      assert(row.getUTF8String(1).toString == PcapSynth.certSubjectCn(k))
      assert(row.getUTF8String(2).toString == PcapSynth.certIssuerCn(k))
      assert(row.getLong(3) == PcapSynth.CertNotBefore)
      assert(row.getLong(4) == PcapSynth.certNotAfter(k))
      assert(row.getInt(5) == PcapSynth.certSanCount(k))
      assert(row.getBoolean(6) == (k == 4), s"self_signed k=$k")
    }
  }

  test("null, never a throw: truncation at every byte, garbage, and " +
      "mid-stream suffixes") {
    val flight = PcapSynth.tlsCertFlight(0)
    // complete ServerHello record alone (no Certificate yet): null
    val shLen = 5 + (((flight(3) & 0xFF) << 8) | (flight(4) & 0xFF))
    assert(TlsCertParse.parse(
      java.util.Arrays.copyOfRange(flight, 0, shLen)) == null)
    // truncations anywhere before the Certificate record completes: null
    val certEnd = {
      val rl2 = ((flight(shLen + 3) & 0xFF) << 8) | (flight(shLen + 4) & 0xFF)
      shLen + 5 + rl2
    }
    for (cut <- 1 until certEnd)
      assert(TlsCertParse.parse(
        java.util.Arrays.copyOfRange(flight, 0, cut)) == null, s"cut $cut")
    // any truncation at or past the Certificate record end: parses
    assert(TlsCertParse.parse(
      java.util.Arrays.copyOfRange(flight, 0, certEnd)) != null)
    // a mid-stream suffix (what a lone later segment looks like): null
    for (from <- 1 until 40)
      assert(TlsCertParse.parse(
        java.util.Arrays.copyOfRange(flight, from, flight.length)) == null,
        s"from $from")
    // deterministic garbage: never throws
    var seed = 12345L
    for (len <- Seq(0, 1, 4, 9, 64, 300)) {
      val b = Array.tabulate[Byte](len) { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        (seed >>> 56).toByte
      }
      TlsCertParse.parse(b) // must not throw
      if (len > 0) { b(0) = 0x16; if (len > 1) b(1) = 3 }
      TlsCertParse.parse(b)
    }
  }

  test("query: five certificate rows; expired and self-signed flag " +
      "exactly the k=3 / k=4 populations") {
    val rows = run("pcap_tls_certs").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(7),
        r.getLong(8), r.getBoolean(9)))
    assert(rows.length == 5)
    assert(rows.filter(_._5).map(_._2).toSeq == Seq("www.site3.example"))
    assert(rows.filter(_._3).map(_._2).toSeq == Seq("www.site4.example"))
    assert(rows.forall(_._4 == 12L)) // 60 sessions / 5 populations
  }

  test("plan: no cartesian; one reassembly exchange + one rollup " +
      "exchange") {
    val plan = run("pcap_tls_certs").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 2, s"$shuffles shuffles\n$plan")
  }
}
