package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior checks for the round-3 pipeline operators (the DuckDB oracle
  * pins exact values; these assert the *properties* that make each
  * operator worth running at scale). */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bloom prefilter: exact result, and the bloom actually prunes") {
    import spark.implicits._
    val out = SparkEntry.queries("dedup_bloom_prefilter")(spark, sf).cache()
    val batch = Tables.documents(spark, sf).filter($"doc_id" % 5 === 0)
    assert(out.count() == batch.count()) // every batch doc classified
    // flags must equal the naive exact semi-join (no bloom false negatives)
    val keyed = Tables.documents(spark, sf).select($"doc_id",
      md5(array_join(slice(split(lower($"text"), "\\s+"), 1, 8), " ")
        .cast("binary")).as("k"))
    val refKeys = keyed.filter($"doc_id" % 5 =!= 0)
      .select($"k").distinct().as[String].collect().toSet
    val naive = keyed.filter($"doc_id" % 5 === 0)
      .as[(Long, String)].collect()
      .map { case (id, k) => id -> refKeys.contains(k) }.toMap
    val got = out.select($"doc_id", $"is_dup").as[(Long, Boolean)]
      .collect().toMap
    assert(got == naive)
    assert(got.values.count(identity) > 0, "expected some real dups")
    // the pre-filter must pass only a small candidate set to the join:
    // true dups + ~1% fp of the clean docs
    val bloom = keyed.filter($"doc_id" % 5 =!= 0)
      .stat.bloomFilter("k", 100000L, 0.01)
    val candidates = naive.count { case (id, _) =>
      val k = keyed.filter($"doc_id" === id).as[(Long, String)].head()._2
      bloom.mightContainString(k)
    }
    val trueDups = naive.values.count(identity)
    assert(candidates < trueDups + 10,
      s"bloom passed $candidates of ${naive.size} (true dups: $trueDups)")
  }

  test("contamination: reported pairs genuinely share a 4-gram") {
    import spark.implicits._
    val out = SparkEntry.queries("pipeline_contamination")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    def grams(id: Long): Set[String] = {
      val text = Tables.documents(spark, sf)
        .filter($"doc_id" === id).select($"text").as[String].head()
      val ws = text.toLowerCase.split("\\s+")
      (0 to ws.length - 4).map(i => ws.slice(i, i + 4).mkString(" ")).toSet
    }
    out.take(5).foreach { case (trainId, evalId, nShared, frac) =>
      val shared = grams(trainId).intersect(grams(evalId)).size
      assert(shared == nShared, s"pair ($trainId, $evalId)")
      assert(frac > 0.0 && frac <= 1.0)
    }
    // no eval doc may appear on the train side
    assert(out.forall { case (t, e, _, _) => t % 20 != 0 && e % 20 == 0 })
  }

  test("domain mix: audit is consistent and rates land near targets") {
    import spark.implicits._
    val rows = SparkEntry.queries("pipeline_domain_mix")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 20) // one audit row per source
    rows.foreach { case (_, pct, total, kept, _) =>
      assert(pct >= 20 && pct <= 99)
      assert(kept <= total)
    }
    // across all sources the realized rate tracks the mean target
    val meanTarget = rows.map(_._2).sum.toDouble / rows.length / 100.0
    val realized = rows.map(_._4).sum.toDouble / rows.map(_._3).sum
    assert(math.abs(realized - meanTarget) < 0.15,
      s"realized $realized vs mean target $meanTarget")
  }

  test("kmeans: full assignment, deterministic, beats a single centroid") {
    import spark.implicits._
    val out = SparkEntry.queries("sim_kmeans_cluster")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 500)
    assert(out.map(_._2).toSet == (0L until 8L).toSet)
    assert(out.forall(_._3 >= 0.0))
    // rerun-stability (exact integer centroid sums -> no float wobble)
    val again = SparkEntry.queries("sim_kmeans_cluster")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // objective sanity: k=8 must beat the k=1 trivial clustering
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id",
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val global = e.select(posexplode($"v"))
      .groupBy($"pos").agg(avg($"col").as("c")).orderBy($"pos")
      .select($"c").as[Double].collect()
    val gB = spark.sparkContext.broadcast(global)
    val k1 = e.select($"v").as[Seq[Double]].collect().map { v =>
      v.zip(gB.value).map { case (x, c) => (x - c) * (x - c) }.sum
    }.sum
    // near-random high-dim vectors leave little clusterable structure,
    // so require strict improvement, not a large margin
    assert(out.map(_._3).sum < k1,
      s"kmeans objective ${out.map(_._3).sum} vs k=1 $k1")
  }

  test("semantic dedup: pairs are within-cluster and above threshold") {
    import spark.implicits._
    val clusters = SparkEntry.queries("sim_kmeans_cluster")(spark, sf)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    val pairs = SparkEntry.queries("dedup_semantic")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (cl, v1, v2, cos) =>
      assert(v1 < v2)
      assert(clusters(v1) == cl && clusters(v2) == cl,
        s"pair ($v1, $v2) not in cluster $cl")
      assert(cos > 0.3)
    }
  }

  test("fuzzy contamination catches every LSH near-dup pair crossing the split") {
    import spark.implicits._
    // both queries band the same signatures, so any dedup_minhash_lsh
    // pair with exactly one eval-side doc (doc_id % 20 == 0) MUST
    // surface as a fuzzy-contamination candidate — no false negatives
    // relative to the dedup detector's own recall
    val lshCross = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .as[(Long, Long)].collect()
      .flatMap { case (d1, d2) =>
        (d1 % 20 == 0, d2 % 20 == 0) match {
          case (true, false) => Some((d2, d1)) // (train, eval)
          case (false, true) => Some((d1, d2))
          case _             => None
        }
      }.toSet
    val fuzzy = SparkEntry.queries("pipeline_contamination_fuzzy")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(fuzzy.nonEmpty)
    fuzzy.foreach { case (tr, ev, est) =>
      assert(tr % 20 != 0 && ev % 20 == 0, s"split violated: ($tr, $ev)")
      assert(est >= 0.0 && est <= 1.0)
      // banded candidates share >= 1 of 4 bands = >= 2 of 8 mins agree
      assert(est >= 0.25, s"candidate ($tr, $ev) below band floor: $est")
    }
    val fuzzyPairs = fuzzy.map(f => (f._1, f._2)).toSet
    assert(lshCross.subsetOf(fuzzyPairs),
      s"missed cross-split pairs: ${lshCross -- fuzzyPairs}")
  }

  test("embedding drift: one shuffle, O(labels x dims) output, shift " +
      "is exactly the mean difference") {
    val df = SparkEntry.queries("pipeline_embedding_drift")(spark, sf)
    val rows = df.collect()
    val nLabels = graft.Tables.embeddings(spark, sf)
      .select("label").distinct().count()
    assert(rows.length == nLabels * 64, s"${rows.length} rows")
    rows.foreach { r =>
      val (nr, nc) = (r.getLong(2), r.getLong(3))
      assert(nr > 0 && nc > 0)
      // per-row IEEE identity: shift = mean_cur - mean_ref exactly
      assert(r.getDouble(6) == r.getDouble(5) - r.getDouble(4), r.toString)
    }
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 1, s"$shuffles shuffles\n$plan")
  }
}
