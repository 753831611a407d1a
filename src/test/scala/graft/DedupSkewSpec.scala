package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hot-shingle skew safety: the DF cap in dedup_ngram_jaccard_capped
  * must demonstrably remove the hottest inverted-index keys — the
  * join-partition bound that keeps the op sub-quadratic at 100 TB. */
class DedupSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val cap = 5 // mirrors Dedup.DfCap

  /** The shingle construction of Dedup.shingles, recomputed here. */
  private def shingleDf = {
    import spark.implicits._
    Tables.documents(spark, sf)
      .select($"doc_id", split(lower($"text"), "\\s+").as("ws"))
      .filter(size($"ws") >= 3)
      .select($"doc_id", explode(array_distinct(expr(
        "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")))
        .as("shingle"))
      .groupBy($"shingle").agg(count(lit(1)).as("df"))
  }

  test("the DF cap actually bites on this corpus, and bounds every join key") {
    import spark.implicits._
    val maxDf = shingleDf.agg(max($"df")).head.getLong(0)
    assert(maxDf > cap,
      s"corpus max shingle df $maxDf <= cap $cap: the cap test is vacuous")
    val hot = shingleDf.filter($"df" > cap).count()
    assert(hot > 0)
    // after the cap, no surviving key exceeds DfCap -> every inverted-
    // index join partition is bounded by DfCap^2 candidate pairs
    val survivorMax = shingleDf.filter($"df" <= cap)
      .agg(max($"df")).head.getLong(0)
    assert(survivorMax <= cap)
  }

  test("capped query still finds near-dup pairs, and the cap changes scores") {
    import spark.implicits._
    def pairs(name: String): Map[(Long, Long), Double] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = pairs("dedup_ngram_jaccard_capped")
    val uncapped = pairs("dedup_ngram_jaccard")
    assert(capped.nonEmpty, "cap must not empty the result on this corpus")
    // the cap must be observable end-to-end: some pair set or score
    // differs from the uncapped op (hot shingles no longer contribute
    // to intersections/unions)
    assert(capped != uncapped,
      "capped result identical to uncapped: the cap did not bite")
  }

  /** A pathological crawl shard: one 1000-way duplicate cluster (every
    * copy lands in the SAME LSH bucket in all 4 bands) plus a tail of
    * distinct docs and a couple of small near-dup groups. Written once
    * per suite to a temp dir in the driver's documents.parquet shape. */
  private lazy val hotDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-skew").toString
    val boiler = (1 to 40).map(i => s"boilerplate$i").mkString(" ")
    val cluster = (0L until 1000L).map(i => (i, boiler))
    val tail = (0L until 30L).map { i =>
      (2000L + i, (1 to 40).map(w => s"tail${i}w$w").mkString(" "))
    }
    // two small duplicate pairs: buckets of size 2 <= BucketCap, so the
    // all-pairs branch runs too and the corpus has >= 3 clusters
    val textA = (1 to 40).map(i => s"groupAword$i").mkString(" ")
    val textB = (1 to 40).map(i => s"groupBword$i").mkString(" ")
    val small = Seq(
      (3000L, textA), (3001L, textA), (3002L, textB), (3003L, textB))
    val docs = (cluster ++ tail ++ small).map { case (id, text) =>
      (id, text, "en", "synthetic", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("hot LSH bucket emits O(n) star pairs, not the O(n^2) clique") {
    val guarded = graft.operators.Dedup.minhashPairs(spark, hotDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 1000-clique would be 499500 pairs in ONE join key; the star
    // is 999 — assert the whole surface stays linear-sized
    assert(guarded.size < 2000,
      s"guard failed: ${guarded.size} pairs (clique would be ~499500)")
    val clusterPairs = guarded.filter(_._2 < 1000L)
    assert(clusterPairs == (1L until 1000L).map(i => (0L, i)).toSet,
      "hot bucket must emit exactly the star to its minimum doc_id")
  }

  test("star edges give the same components as the full pair graph") {
    import spark.implicits._
    def components(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val edges = pairs.select($"doc1".as("src"), $"doc2".as("dst"))
        .union(pairs.select($"doc2".as("src"), $"doc1".as("dst")))
      graft.operators.Dedup.connectedComponents(edges, 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val star = components(graft.operators.Dedup.minhashStarEdges(spark, hotDir))
    val full = components(
      graft.operators.Dedup.minhashPairs(spark, hotDir, bucketCap = Int.MaxValue))
    assert(star == full,
      "components over star edges diverged from the full pair graph")
    assert(star.values.toSet.size >= 2, "corpus must have several clusters")
    // the mega-cluster collapses to its minimum
    (0L until 1000L).foreach(i => assert(star(i) == 0L))
  }

  test("two-level simhash banding: candidates shrink, output is exact") {
    import spark.implicits._
    // completeness + exactness vs driver-side brute force over ALL pairs
    val sigs = SparkEntry.queries("dedup_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs
      if d1 < d2 && java.lang.Long.bitCount(s1 ^ s2) <= 3
    } yield (d1, d2, java.lang.Long.bitCount(s1 ^ s2))).toSet
    val got = SparkEntry.queries("dedup_simhash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute,
      s"banded retrieval missed or invented pairs: got ${got.size}, brute ${brute.size}")
    // the refinement must shard harder than level-1 banding: compare
    // worst-bucket occupancy (the per-join-key candidate driver)
    val l1 = sigs.flatMap { case (_, s) =>
      (0 until 4).map(j => (j, (s >> (j * 8)) & 255L)) }
      .groupBy(identity).values.map(_.size).max
    def rem(s: Long, j: Int): Long = j match {
      case 0 => (s >> 8) & 0xffffff
      case 1 => (s & 255L) | (((s >> 16) & 65535L) << 8)
      case 2 => (s & 65535L) | (((s >> 24) & 255L) << 16)
      case _ => s & 0xffffff
    }
    val l2 = sigs.flatMap { case (_, s) =>
      for (j <- 0 until 4; k <- 0 until 4)
        yield (j, (s >> (j * 8)) & 255L, k, (rem(s, j) >> (k * 6)) & 63L) }
      .groupBy(identity).values.map(_.size).max
    assert(l2 < l1,
      s"two-level banding must cut worst-bucket occupancy ($l2 vs $l1)")
  }

  test("PPJoin prefixes exclude boilerplate, so the verify join-back " +
      "is candidate-bounded (round-8 verdict #7)") {
    import spark.implicits._
    // Adversarial boilerplate-heavy corpus: 40 docs sharing the SAME
    // 55 boilerplate tokens (df = 40, the hottest possible keys) plus
    // 45 per-doc unique tokens each — boilerplate fraction 0.55 < t =
    // 0.6, so every prefix (the rarest floor(0.4·sz)+1 = 41 tokens)
    // consists of unique tokens only. Docs 100/101 are additionally
    // true near-dups (share their 45 "unique" tokens too → J = 1.0).
    val boiler = (0 until 55).map(i => s"B$i")
    def uniq(d: Int) = (0 until 45).map(i => s"U${d}_$i")
    val docs = (0 until 40).map { d =>
      val id = 100L + d
      val toks = if (d == 1) boiler ++ uniq(0) else boiler ++ uniq(d)
      id -> toks
    }
    val sh = docs.flatMap { case (id, toks) => toks.map(id -> _) }
      .toDF("doc_id", "shingle")
    val prefix = operators.Dedup.ppjoinPrefix(sh)
    // 1. no boilerplate token ever enters a prefix — the hot keys that
    //    would drive |candidates| toward N² contribute nothing
    assert(prefix.filter($"shingle".startsWith("B")).count() == 0,
      "a boilerplate (df=40) token entered a PPJoin prefix")
    // 2. |candidates| is exactly the one true near-dup pair — the
    //    verify join-back therefore touches 2 docs' shingles, not
    //    40·39/2 = 780 pairs x 100 shingles (the naive join's work)
    val cand = operators.Dedup.ppjoinCandidates(sh).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.toSeq == Seq((100L, 101L)),
      s"candidates must be exactly the planted near-dup pair: " +
        cand.mkString(","))
    // 3. completeness sanity on the same corpus: the planted pair
    //    really does clear t (J = 1.0 ≥ 3/5), so pruning it would have
    //    been a recall bug, not a skew win
    val sets = docs.toMap
    val inter = sets(100L).toSet.intersect(sets(101L).toSet).size
    val union = sets(100L).toSet.union(sets(101L).toSet).size
    assert(inter * 5 >= union * 3)
  }
}
