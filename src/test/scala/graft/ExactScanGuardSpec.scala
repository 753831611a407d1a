package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The exact-kernel size guard (round-8 verdict #5): past a flops
  * threshold the O(|Q|·|N|·dim) exact cosine scan must fail fast,
  * pointing at the trained ANN family, and the option gate must let a
  * deliberate caller through. Conf knobs are session-scoped (SQLConf),
  * so the spec drives a `newSession()` — the shared session other
  * suites run exact kernels on never sees the lowered threshold. */
class ExactScanGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("a scan past the flops cap refuses with an actionable message; " +
       "the option gate and the default threshold both let work through") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.sim.exactScanMaxFlops", "1")
    for (name <- Seq("sim_cosine_topk", "sim_cosine_topk_blocked")) {
      val e = intercept[IllegalStateException] {
        SparkEntry.queries(name)(s2, sf).count()
      }
      assert(e.getMessage.contains("sim_ann_ivfpq"),
        s"$name guard must route the user to the trained ANN family")
      assert(e.getMessage.contains("allowLargeExactScan"),
        s"$name guard must name the escape hatch")
    }
    // the option gate overrides the cap for a deliberate exact scan
    s2.conf.set("spark.graft.sim.allowLargeExactScan", "true")
    assert(SparkEntry.queries("sim_cosine_topk")(s2, sf).count() > 0)
    // and the shared-session default threshold admits the test corpora
    assert(SparkEntry.queries("sim_cosine_topk_blocked")(spark, sf)
      .count() > 0)
  }
}
