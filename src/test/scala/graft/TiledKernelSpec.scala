package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Query-block tiling in the blocked cosine kernel (round-6 verdict #2):
  * splitting the broadcast query matrix into bounded tiles must not
  * change a bit of the result — tiles partition the qid space and each
  * scores exactly the pairs the single-block kernel scores, with the
  * same sequential double fold. */
class TiledKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))

  test("forced tiny tiles are bit-identical to the single-block kernel") {
    val untiled = rows(graft.operators.Similarity.blockedCosineTopK(spark, sf))
    assert(untiled.nonEmpty)
    // tileSize=3 (many multi-query tiles) and 1 (degenerate: a pass per
    // query) both exercise the union-of-tiles merge path
    for (tile <- Seq(3, 1)) {
      val tiled = rows(
        graft.operators.Similarity.blockedCosineTopK(spark, sf, tileSize = tile))
      assert(tiled.sameElements(untiled),
        s"tileSize=$tile diverged from the single-block kernel")
    }
    // and both equal the pair-expression query (the shared-oracle twin)
    val pairForm = rows(SparkEntry.queries("sim_cosine_topk")(spark, sf))
    assert(untiled.sameElements(pairForm))
  }
}
