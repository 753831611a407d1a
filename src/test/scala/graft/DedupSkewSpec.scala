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
}
