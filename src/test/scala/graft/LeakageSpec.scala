package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The property `pipeline_leakage_split` exists for, pinned
  * mechanically (the DuckDB hash match proves the row set; THIS proves
  * the row set means what it claims): no near-dup edge straddles the
  * train/val boundary, and every document lands in exactly one split. */
class LeakageSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("no near-dup pair straddles the split; coverage is total and " +
      "both sides are populated") {
    import spark.implicits._
    val split = SparkEntry.queries("pipeline_leakage_split")(spark, sfDir)
      .cache()
    try {
      val docs = Tables.documents(spark, sfDir)
      assert(split.count() == docs.count(), "one row per document")
      assert(split.groupBy($"doc_id").count().filter($"count" > 1).isEmpty,
        "no doc in two splits")
      val sides = split.groupBy($"split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sides.keySet == Set("train", "val"), sides.toString)
      assert(sides("train") > sides("val"), "80/20 shape")
      // the leakage property itself: both endpoints of every banded
      // near-dup edge carry the SAME split label
      val edges = operators.Dedup.minhashStarEdges(spark, sfDir)
      val l = split.select($"doc_id".as("doc1"), $"split".as("s1"))
      val r = split.select($"doc_id".as("doc2"), $"split".as("s2"))
      val straddling = edges.join(l, "doc1").join(r, "doc2")
        .filter($"s1" =!= $"s2")
      assert(straddling.isEmpty,
        straddling.limit(5).collect().mkString(", "))
    } finally split.unpersist()
  }
}
