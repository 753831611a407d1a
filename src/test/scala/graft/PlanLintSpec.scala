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

  test("no explicit broadcast hint covers a corpus-sized relation " +
      "(round-16 verdict #2: the class of bug where a broadcast side " +
      "is fine at test scale and an executor OOM at 100 TB)") {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, ResolvedHint}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    // relations that are unbounded at production scale: every graft
    // DSv2 corpus source, and the fact-table parquets (the TPC-H dims
    // region/nation/supplier/customer/part are genuinely broadcast-able)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit}
    val factTables = Set("lineitem", "orders", "events", "documents",
      "embeddings")
    // Corpus relations reachable from `p` WITHOUT crossing a bounding
    // node. An Aggregate or GlobalLimit on the path bounds what the
    // broadcast actually ships (a reduction/cap of the scan, not the
    // scan) — the class this lint hunts is the raw scan-side broadcast
    // (round-16 verdict #2/#3), which has neither. Known limitation:
    // an Aggregate keyed on a corpus-cardinality column would slip
    // through; those shapes are caught by the maxShuffles/plan audits.
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, LessThan, Literal}
    // a Filter containing `<unique id column> < literal` is the
    // constant-id-cap pattern: with unique ids it bounds the row
    // count independent of corpus size (QueryIdCap / EvalIdCap).
    // Restricted to id-convention columns — `http_status < 400` or
    // `body_bytes < 1000` bound NOTHING and must not satisfy the lint
    def constCapped(f: Filter): Boolean =
      f.condition.exists {
        case LessThan(a: AttributeReference, _: Literal)
            if a.name == "vec_id" || a.name == "doc_id" ||
              a.name.endsWith("_id") => true
        case _ => false
      }
    def corpusRelations(p: LogicalPlan): Seq[String] = {
      val here = p match {
        case _: Aggregate | _: GlobalLimit => return Seq.empty
        case f: Filter if constCapped(f) => return Seq.empty
        case r: DataSourceV2Relation
            if r.table.getClass.getName.startsWith("graft") =>
          Seq(r.table.getClass.getSimpleName)
        case lr: LogicalRelation =>
          val paths = lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Seq.empty
          }
          paths.flatMap(p => factTables.find(t => p.contains(t)))
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(corpusRelations) ++
        p.subqueries.flatMap(corpusRelations)
    }
    def hintedCorpus(p: LogicalPlan): Seq[String] = {
      val here = p match {
        case h: ResolvedHint if h.hints.strategy.isDefined =>
          corpusRelations(h.child)
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(hintedCorpus) ++
        p.subqueries.flatMap(hintedCorpus)
    }
    // Every remaining broadcast hint whose subtree reads an unreduced
    // corpus relation is an explicit, justified decision. A constant
    // id-cap filter (the QueryIdCap discipline, Similarity.scala:623)
    // also bounds a broadcast side — recognized below as a Filter
    // containing `attr < literal`.
    val allowed = Map(
      "warc_redirect_chains" -> "redirect map = 3xx-only slice of the crawl",
      "sim_knn_graph" -> ("every vector is a query BY DEFINITION of a " +
        "knn graph; guardExactScanFull refuses to launch past the flop " +
        "cap — the scale path is the ANN family")
    )
    val offenders = SparkEntry.all.flatMap { q =>
      val hinted = hintedCorpus(
        q.fn(spark, sf).queryExecution.analyzed).distinct
      if (hinted.nonEmpty && !allowed.contains(q.name))
        Seq(s"${q.name}: broadcast hint over ${hinted.mkString(",")}")
      else Nil
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
