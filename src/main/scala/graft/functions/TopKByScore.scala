package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate inside a [[TopKByScore]] buffer. */
final case class ScoredId(id: Long, score: Double)

/** Per-group top-k by (score desc, id asc) as a typed `Aggregator` — the
  * scale-safe replacement for `row_number().over(Window.partitionBy(g)
  * .orderBy(score.desc, id.asc)) <= k`.
  *
  * The window form shuffles EVERY scored row into the per-group sort; at
  * a 100 TB corpus the Q×N pair set is the largest dataset in the job
  * and that exchange dominates the plan. This aggregator runs inside
  * `ObjectHashAggregate` with map-side partial aggregation: each task
  * reduces its local pairs to at most k rows per group, so only
  * `groups × k × tasks` tiny buffers cross the wire and the final merge
  * is a k-way list merge (the same per-partition-heap + small-merge shape
  * the sim_ann_pq ADC scan documents).
  *
  * Determinism matches the window it replaces bit-for-bit: scores compare
  * via `java.lang.Double.compare` (Spark's SortOrder total ordering for
  * doubles, -0.0 < 0.0 < NaN) and exact ties break to the lowest id. The
  * buffer is kept sorted best-first and capped at k, so reduce/merge are
  * associative and commutative regardless of partitioning.
  *
  * `ascending = true` ranks by (score asc, id asc) instead — the
  * distance-metric form the PQ/IVF-PQ ADC scans use.
  */
class TopKByScore(k: Int, ascending: Boolean = false,
    dedupIds: Boolean = false)
  extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  /** true if a ranks strictly better than b. */
  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    (if (ascending) c < 0 else c > 0) || (c == 0 && a.id < b.id)
  }

  private def insert(buf0: List[ScoredId], x: ScoredId): List[ScoredId] = {
    // `dedupIds` ranks each id by its BEST score (top-k over per-id
    // min/max instead of over raw pairs) — the multi-entry candidate
    // shape of the IVF-PQ replica scan, folded inside the aggregator
    // instead of a separate (group, id) exchange. The cap stays
    // lossless by the usual dominance argument: if a buffer dropped
    // id X, it kept k DISTINCT ids each strictly better than X's best
    // score in that buffer, and their global bests only improve.
    val buf =
      if (!dedupIds) buf0
      else buf0.find(_.id == x.id) match {
        case Some(prev) if !better(x, prev) => return buf0 // keep prev
        case Some(prev) => buf0.filterNot(_ eq prev)
        case None => buf0
      }
    // buf is sorted best-first and has at most k elements; an O(k)
    // insertion keeps it that way (k is tiny — 5 here)
    if (buf.length >= k && !better(x, buf.last)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      val merged = pre ::: (x :: post)
      if (merged.length > k) merged.take(k) else merged
    }
  }

  override def zero: List[ScoredId] = Nil
  override def reduce(buf: List[ScoredId], in: ScoredId): List[ScoredId] =
    insert(buf, in)
  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: ExpressionEncoder[List[ScoredId]] =
    ExpressionEncoder[List[ScoredId]]()
  override def outputEncoder: ExpressionEncoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}
