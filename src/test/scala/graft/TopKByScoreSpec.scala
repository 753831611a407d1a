package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ScoredId, TopKByScore}

/** The top-k aggregator must be EXACTLY the window rank it replaces, for
  * any partitioning: reduce/merge in any grouping/order must equal the
  * global sort. This is the property PartitionInvarianceSpec checks
  * end-to-end; here it's pinned at the unit level with adversarial
  * inputs — heavy ties, -0.0/0.0, empty/tiny/oversized groups.
  * (Deterministic seeded generation — the scalatest/scalacheck bridge
  * isn't in the offline artifact cache.) */
class TopKByScoreSpec extends AnyFunSuite {

  private def reference(xs: Seq[ScoredId], k: Int,
      ascending: Boolean): Seq[ScoredId] =
    xs.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a.score, b.score)
      (if (ascending) c < 0 else c > 0) || (c == 0 && a.id < b.id)
    }.take(k)

  private def viaAggregator(xs: Seq[ScoredId], k: Int, ascending: Boolean,
      chunks: Int): Seq[ScoredId] = {
    val agg = new TopKByScore(k, ascending)
    val parts = xs.zipWithIndex.groupBy(_._2 % math.max(chunks, 1)).toSeq
      .sortBy(_._1).map(_._2.map(_._1)) // deterministic uneven split
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    agg.finish(bufs.foldLeft(agg.zero)(agg.merge))
  }

  private val scorePool =
    Array(-1.5, -0.0, 0.0, 0.5, 0.5, 2.0, 3.25, Double.MinPositiveValue)

  test("aggregator == global sort for any input, k, and partitioning") {
    val rnd = new Random(7)
    for (_ <- 1 to 500) {
      val n = rnd.nextInt(61)
      // small score/id domains force heavy ties
      val xs = Seq.fill(n)(ScoredId(rnd.nextInt(21).toLong,
        scorePool(rnd.nextInt(scorePool.length))))
      val k = 1 + rnd.nextInt(8)
      val chunks = 1 + rnd.nextInt(7)
      val asc = rnd.nextBoolean()
      assert(viaAggregator(xs, k, asc, chunks) == reference(xs, k, asc),
        s"n=$n k=$k chunks=$chunks asc=$asc")
    }
  }

  test("merge argument order does not matter") {
    val rnd = new Random(13)
    for (_ <- 1 to 200) {
      val xs = Seq.fill(rnd.nextInt(40))(ScoredId(rnd.nextInt(15).toLong,
        scorePool(rnd.nextInt(scorePool.length))))
      val k = 1 + rnd.nextInt(6)
      val asc = rnd.nextBoolean()
      val agg = new TopKByScore(k, asc)
      val (l, r) = xs.splitAt(xs.length / 2)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bl, br)) == agg.finish(agg.merge(br, bl)))
    }
  }

  test("dedupIds mode == top-k over per-id best, any partitioning") {
    // the IVF-PQ replica-scan shape (round-9): the same id arrives up
    // to several times with different scores; ranking is over each
    // id's BEST score, and the cap must stay lossless under any split
    // (the dominance argument in the insert comment)
    def refDedup(xs: Seq[ScoredId], k: Int, asc: Boolean): Seq[ScoredId] = {
      val best = xs.groupBy(_.id).values.map(g =>
        reference(g, 1, asc).head).toSeq
      reference(best, k, asc)
    }
    val rnd = new Random(29)
    for (_ <- 1 to 500) {
      val n = rnd.nextInt(61)
      val xs = Seq.fill(n)(ScoredId(rnd.nextInt(9).toLong, // dense dups
        scorePool(rnd.nextInt(scorePool.length))))
      val k = 1 + rnd.nextInt(8)
      val chunks = 1 + rnd.nextInt(7)
      val asc = rnd.nextBoolean()
      val agg = new TopKByScore(k, asc, dedupIds = true)
      val parts = xs.zipWithIndex.groupBy(_._2 % chunks).toSeq
        .sortBy(_._1).map(_._2.map(_._1))
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val got = agg.finish(bufs.foldLeft(agg.zero)(agg.merge))
      assert(got == refDedup(xs, k, asc),
        s"n=$n k=$k chunks=$chunks asc=$asc xs=$xs")
    }
  }

  test("-0.0 and 0.0 keep Spark's total order (-0.0 < 0.0)") {
    val xs = Seq(ScoredId(1, 0.0), ScoredId(2, -0.0))
    // descending: 0.0 ranks above -0.0
    assert(viaAggregator(xs, 2, ascending = false, 1) ==
      Seq(ScoredId(1, 0.0), ScoredId(2, -0.0)))
    // ascending: -0.0 first
    assert(viaAggregator(xs, 2, ascending = true, 1) ==
      Seq(ScoredId(2, -0.0), ScoredId(1, 0.0)))
  }
}
