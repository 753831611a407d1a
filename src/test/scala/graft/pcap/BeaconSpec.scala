package graft.pcap

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** C2 beaconing detection (`pcap_beacon_candidates`): the periodicity
  * sweep must flag every engineered beacon flow (low-CV check-in
  * cadence), keep high-variance noise flows unflagged, and gate out
  * flows below the minimum-observation threshold entirely. The DuckDB
  * oracle replays the emission formulas; this spec pins the structural
  * claims the hash match alone doesn't show (which side of the
  * threshold each population lands on, and by what margin). */
class BeaconSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private lazy val rows = {
    val q = graft.operators.PcapQueries.defs
      .find(_.name == "pcap_beacon_candidates").get
    q.fn(spark, "unused").collect()
      .map(r => (r.getString(0), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
  }

  test("every beacon flow is flagged, with the configured period " +
      "recovered and a wide margin under the CV threshold") {
    val beacons = rows.filter(_._1.startsWith("10.80."))
    assert(beacons.length == 24)
    beacons.foreach { case (src, dp, nPkts, periodMs, cv2bp, flagged) =>
      val c = src.split("\\.").drop(2).map(_.toInt)
        .foldLeft(0)((a, b) => (a << 8) | b)
      val expected = (30L + (c % 5) * 10L) * 1000L
      assert(dp == 443 && nPkts == 40 && flagged)
      // jitter is +/-200 ms, so the mean gap sits within 200 of period
      assert(math.abs(periodMs - expected) <= 200, s"$src period")
      // CV ~ 0.004 -> cv2_bp ~ 0, far below the <=100 gate
      assert(cv2bp <= 10, s"$src cv2_bp=$cv2bp")
    }
  }

  test("noise flows survive the observation gate unflagged; short " +
      "flows are gated out") {
    val noise = rows.filter(_._1.startsWith("10.81."))
    // 18 noise flows, every 5th (b=4,9,14) is short (5 pkts < 9)
    assert(noise.length == 15)
    noise.foreach { case (src, _, nPkts, _, cv2bp, flagged) =>
      assert(nPkts == 20 && !flagged, s"$src flagged")
      // uniform-ish [1s,61s] gaps: CV ~ 0.55 -> cv2_bp ~ 3000
      assert(cv2bp > 1000, s"$src cv2_bp=$cv2bp")
    }
    assert(rows.length == 39)
  }

  test("the window and the rollup share one exchange on the flow key") {
    val q = graft.operators.PcapQueries.defs
      .find(_.name == "pcap_beacon_candidates").get
    val plan = q.fn(spark, "unused").queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, plan:\n$plan")
  }
}
