package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality checks: the approximate paths (LSH, IVF) must agree with
  * the exact brute-force top-k on a measurable fraction of neighbors —
  * "measure, don't guess" applied to recall, not just speed. */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def topkPairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("seed-baseline IVF clears random-scan recall (ablation floor)") {
    val exact = topkPairs("sim_cosine_topk")
    val ivf = topkPairs("sim_ann_ivf_seed_baseline")
    assert(exact.nonEmpty && ivf.nonEmpty)
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    info(s"seed-baseline IVF recall@5 = $recall")
    // the UNTRAINED ablation twin: nprobe=4 of ~17 sampled lists on
    // random-ish vectors — recall is well below the trained variant by
    // design (that gap is what this query measures), but must be far
    // above the ~24% random-scan rate
    assert(recall >= 0.35, s"IVF recall $recall")
    // every IVF hit must be a genuine vector pair, ranked <= 5
    val rns = SparkEntry.queries("sim_ann_ivf_seed_baseline")(spark, sf)
      .select("rn").collect().map(_.getInt(0))
    assert(rns.forall(r => r >= 1 && r <= 5))
  }

  test("IVF result is deterministic across runs") {
    assert(topkPairs("sim_ann_ivf_seed_baseline") ==
      topkPairs("sim_ann_ivf_seed_baseline"))
  }

  test("kmeans-trained IVF reaches production recall (>= 0.7) and beats the seed baseline") {
    val exact = topkPairs("sim_cosine_topk")
    val trained = topkPairs("sim_ann_ivf_kmeans")
    assert(exact.nonEmpty && trained.nonEmpty)
    val recall = trained.intersect(exact).size.toDouble / exact.size
    info(s"trained-IVF recall@5 = $recall")
    // the PRODUCTION IVF path: Lloyd-trained coarse quantizer at the
    // same nprobe budget must reach deployable recall, and the
    // trained-vs-seed gap must be positive (what training buys)
    assert(recall >= 0.7, s"trained-IVF recall $recall")
    val seed = topkPairs("sim_ann_ivf_seed_baseline")
    val seedRecall = seed.intersect(exact).size.toDouble / exact.size
    assert(recall > seedRecall,
      s"training must beat the seed baseline ($recall vs $seedRecall)")
    val rns = SparkEntry.queries("sim_ann_ivf_kmeans")(spark, sf)
      .select("rn").collect().map(_.getInt(0))
    assert(rns.forall(r => r >= 1 && r <= 5))
  }

  test("PQ ADC top-k approximates the exact squared-L2 top-k") {
    // PQ ranks by asymmetric squared-L2, so the honest baseline is the
    // exact squared-L2 top-5 (cosine would conflate metric change with
    // quantization loss)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val exact = vecs.keys.filter(_ % 50 == 0).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(c => (sq(vecs(q), vecs(c)), c)).take(5).map(q -> _)
    }.toSet
    val pq = topkPairs("sim_ann_pq")
    assert(exact.nonEmpty && pq.nonEmpty && pq.size == exact.size)
    val recall = pq.intersect(exact).size.toDouble / exact.size
    info(s"PQ recall@5 = $recall")
    // ADC top-100 shortlist + exact rerank over Lloyd-trained codebooks:
    // quantization only costs the neighbors the coarse scan drops from
    // the shortlist (was ~0.86 with untrained seed codebooks)
    assert(recall >= 0.95, s"PQ recall $recall")
  }

  test("PQ result is deterministic across runs") {
    assert(topkPairs("sim_ann_pq") == topkPairs("sim_ann_pq"))
  }

  test("IVF-PQ approximates the exact squared-L2 top-k") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val exact = vecs.keys.filter(_ % 50 == 0).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(c => (sq(vecs(q), vecs(c)), c)).take(5).map(q -> _)
    }.toSet
    val ivfpq = topkPairs("sim_ann_ivfpq")
    assert(exact.nonEmpty && ivfpq.nonEmpty)
    val recall = ivfpq.intersect(exact).size.toDouble / exact.size
    info(s"IVF-PQ recall@5 = $recall")
    // round-9: redundant A=3 assignment (each vector indexed in its 3
    // nearest lists) lifts the nprobe=4/8 routing bound from ~0.78
    // (single assignment) to ~0.98; after ADC shortlist truncation +
    // exact re-rank the end-to-end floor is production-grade ≥0.95
    assert(recall >= 0.95, s"IVF-PQ recall $recall")
    assert(topkPairs("sim_ann_ivfpq") == topkPairs("sim_ann_ivfpq"),
      "IVF-PQ must be deterministic")
  }

  test("blocked kernel top-k is bit-identical to the pair-expression form") {
    // same oracle, same ordering contract — every column including the
    // double cosine must match exactly (the kernel folds the dot in the
    // same element order as VecDot, so scores are bit-equal, not just
    // approximately equal)
    def rows(name: String): Set[(Long, Long, Long, Int)] =
      SparkEntry.queries(name)(spark, sf)
        .select("qid", "cid", "cos", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getInt(3)))
        .toSet
    val pair = rows("sim_cosine_topk")
    val blocked = rows("sim_cosine_topk_blocked")
    assert(pair.nonEmpty)
    assert(blocked == pair)
    // and the kernel plan must not contain a join at all — the pair set
    // is never materialized as rows
    val plan = SparkEntry.queries("sim_cosine_topk_blocked")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"kernel plan must be join-free:\n$plan")
  }

  test("filtered ANN: every hit satisfies the predicate, queries stay " +
      "unrestricted, and the filter sits under the bucket join") {
    import spark.implicits._
    val res = SparkEntry.queries("sim_ann_lsh_filtered")(spark, sf)
    val hits = res.select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.nonEmpty)
    val labels = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // candidates: predicate holds for every returned neighbor
    assert(hits.forall { case (_, cid) => labels(cid) % 3 == 1 },
      "ineligible candidate leaked through")
    // queries: NOT restricted to the predicate (some qid fails it)
    assert(hits.exists { case (qid, _) => labels(qid) % 3 != 1 },
      "query side must stay unrestricted")
    // pre-filter, not post-filter: the Filter on label must execute
    // below the bucket join (ineligible rows never reach the kernel)
    val plan = res.queryExecution.executedPlan.toString
    val joinAt = plan.indexOf("Join")
    val filterAt = "Filter[^\\n]*label".r.findFirstMatchIn(plan)
      .map(_.start).getOrElse(-1)
    // tree prints top-down: a filter BELOW the join prints after it; a
    // post-filter above the join would print before it
    assert(joinAt >= 0 && filterAt > joinAt,
      s"label predicate must execute on the build side BELOW the join:\n$plan")
  }
}
