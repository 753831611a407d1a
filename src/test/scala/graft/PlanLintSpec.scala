package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.scalatest.funsuite.AnyFunSuite

/** Whole-battery plan lint: structural assertions over every query's
  * physical plan, the automated form of ".explain and iterate". Catches
  * the plan regressions that stay invisible at test scale but kill a
  * 1000-executor run:
  *   - an accidental CartesianProduct (a broadcast NLJ over a tiny
  *     broadcast side is fine and intended in the ANN queries; an
  *     unbroadcast cartesian never is);
  *   - shuffle-count explosions (a rewrite that silently adds exchanges).
  */
class PlanLintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectNodes) ++
      p.subqueries.flatMap(collectNodes)
  }

  // generous ceiling: the deepest intended plans (connected components
  // iterate a fixed number of label-propagation rounds) stay below it
  private val maxShuffles = 24

  test("no query plans an unbroadcast cartesian product or shuffle explosion") {
    val offenders = SparkEntry.all.flatMap { q =>
      val nodes = collectNodes(
        q.fn(spark, sf).queryExecution.executedPlan)
      val cartesian = nodes.count(_.isInstanceOf[CartesianProductExec])
      val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      val problems =
        (if (cartesian > 0) Seq(s"${q.name}: $cartesian CartesianProductExec")
         else Nil) ++
        (if (shuffles > maxShuffles)
           Seq(s"${q.name}: $shuffles shuffle exchanges") else Nil)
      problems
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("candidate-scan top-k runs as partial aggregation, not a window rank") {
    // queries whose ranked set is corpus-sized (the full Q×N pair set or
    // the full ADC code scan): a per-qid window sort there shuffles the
    // whole scored set — these plans must be window-free, with the top-k
    // as an ObjectHashAggregate (map-side partial reduces each task to
    // <= k rows per query before the exchange). The remaining windows in
    // the ANN family rank only tiny broadcast sets (query×centroid
    // probes).
    for (name <- Seq("sim_cosine_topk", "sim_ann_lsh", "sim_ann_pq")) {
      val nodes = collectNodes(SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan)
      assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
        s"$name plans a window rank over a corpus-sized set")
      assert(nodes.exists(_.nodeName.contains("ObjectHashAggregate")),
        s"$name: expected an ObjectHashAggregate-based top-k")
    }
  }

  test("pcap scans decode only the requested columns") {
    val df = spark.read.format("pcap").option("decoder", "dns")
      .load("/root/repo/src/test/resources/test.pcap")
      .select("dns_qname", "dst_port")
    val scans = collectNodes(df.queryExecution.executedPlan)
      .filter(_.nodeName.contains("BatchScan"))
    assert(scans.nonEmpty)
    // pruned output: exactly the two requested columns reach the scan
    assert(scans.head.output.map(_.name).toSet == Set("dns_qname", "dst_port"))
  }

  test("sim_pca_project's distributed side is a single pruned scan " +
      "with zero shuffles (the eigensolve is a driver artifact)") {
    val df = SparkEntry.queries("sim_pca_project")(spark, sf)
    val nodes = collectNodes(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) == 0,
      "the projection must be a narrow map")
    // column pruning reaches the parquet scan: vec_id + embedding only
    val scan = nodes.filter(n => n.nodeName.contains("Scan") &&
      n.output.nonEmpty)
    assert(scan.nonEmpty)
    assert(scan.head.output.map(_.name).toSet == Set("vec_id", "embedding"),
      s"scan reads ${scan.head.output.map(_.name).mkString(",")}")
  }

  test("a wds key/ext listing plans without the data column") {
    val dir = java.nio.file.Files.createTempDirectory("wds_lint").toString
    import spark.implicits._
    Seq(("a", "x".getBytes("UTF-8"))).toDF("key", "txt").coalesce(1)
      .write.format("wds").mode("append").save(dir)
    val df = spark.read.format("wds").load(dir).select("key", "ext")
    val scans = collectNodes(df.queryExecution.executedPlan)
      .filter(_.nodeName.contains("BatchScan"))
    assert(scans.nonEmpty)
    assert(scans.head.output.map(_.name).toSet == Set("key", "ext"),
      s"scan reads ${scans.head.output.map(_.name).mkString(",")}")
  }
}
