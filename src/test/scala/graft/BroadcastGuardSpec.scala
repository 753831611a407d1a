package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The fuzzy-contamination eval-side broadcast hints are size-guarded
  * (round-6 verdict #8): under the doc cap the hints force the
  * broadcast; above it they are dropped so AQE chooses from runtime
  * sizes — and the rows are identical either way. */
class BroadcastGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def hintCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.size

  test("hints force-broadcast under the cap, drop above it, same rows") {
    val hinted = graft.operators.Dedup.contaminationFuzzy(spark, sf)
    assert(hintCount(hinted) == 2,
      "both eval-side joins must carry the broadcast hint under the cap")
    // cap of 0: every non-empty eval split is 'too big' — hints gone,
    // the join strategy is AQE's call
    val guarded =
      graft.operators.Dedup.contaminationFuzzy(spark, sf, broadcastDocCap = 0L)
    assert(hintCount(guarded) == 0,
      "no broadcast hint may survive past the cap")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
    val a = rows(hinted)
    val b = rows(guarded)
    assert(a.nonEmpty && a.sameElements(b),
      "join-strategy choice must not change the result")
  }
}
