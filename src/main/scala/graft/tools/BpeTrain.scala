package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training: the `pipeline_bpe_pairs` counting
  * iteration looped with a merge applied between rounds, until the
  * requested number of merges is learned. Each iteration is one
  * distributed pair-count aggregation over the current symbolization of
  * the corpus (the battery op is exactly one such iteration; see
  * `text_bpe_apply` for the application side).
  *
  * Scale shape: the corpus is re-symbolized lazily per pass by the
  * accumulated replace chain (codegen'd, zero shuffle); only the pair
  * histogram — bounded by (vocab size)^2, tiny — is aggregated and
  * collected, and each pass learns a batch of provably-independent
  * merges from it (see [[train]]), so driver round-trips grow with
  * batch count, not merge count. Driver state is the merge list alone.
  * At 100 TB you'd checkpoint the symbolized corpus every k merges to
  * flatten the replace chain; here the chain stays short.
  *
  * Usage: BpeTrain <sfDir> <nMerges>
  */
object BpeTrain {

  /** Learn `n` merges over `documents.text`; returns them in order.
    *
    * Each pass collects the FULL pair histogram (bounded by the distinct
    * adjacent-pair count — tiny) and learns a BATCH of merges from it,
    * cutting driver round-trips versus one collect per merge, while
    * staying EXACTLY equivalent to the greedy one-merge-at-a-time
    * trainer (Round4OpsSpec pins this against a local reference).
    *
    * Batch safety argument: after applying merge (a, b) -> "ab",
    *   - only pairs containing a or b change counts (decreases), and
    *   - the new pairs all contain "ab", with count((x,ab)) <= the old
    *     count((x,a)) and count((ab,y)) <= the old count((b,y)).
    * So a further candidate taken in sorted order stays the true greedy
    * choice as long as it (1) shares no symbol with any merge already in
    * the batch (its own count is then unchanged) and (2) strictly
    * outcounts every pair a prior batch merge could have created —
    * bounded by max(maxIn(a), maxOut(b)) over the prior merges, where
    * maxIn/maxOut are per-symbol maxima from the same histogram. The
    * first candidate violating either condition ends the batch (not
    * skipped: its relative order versus the changed counts is unknown
    * until the next histogram). */
  def train(spark: SparkSession, dir: String, n: Int): Seq[(String, String)] = {
    import spark.implicits._
    val base = graft.Tables.documents(spark, dir)
      .select(concat(lit(" "),
        regexp_replace(regexp_replace($"text", " ", "|"), "(.)", "$1 "))
        .as("s"))
    var merges = Vector.empty[(String, String)]
    var exhausted = false
    while (merges.length < n && !exhausted) {
      val chain = merges.foldLeft("s") { case (acc, (a, b)) =>
        s"replace(replace($acc, ' $a $b ', ' $a$b '), ' $a $b ', ' $a$b ')"
      }
      // adjacent symbol pairs of the current symbolization; '|' boundary
      // tokens stay in the sequence so any pair that would cross a word
      // boundary touches a '|' and is dropped
      val hist = base.select(expr(s"split(trim($chain), ' ')").as("toks"))
        .select(explode(expr(
          """transform(sequence(1, greatest(size(toks) - 1, 0)),
               i -> struct(element_at(toks, i) AS a,
                           element_at(toks, i + 1) AS b))""")).as("p"))
        .filter($"p.a" =!= "|" && $"p.b" =!= "|")
        .groupBy($"p.a", $"p.b").agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (hist.isEmpty) exhausted = true
      else {
        val maxIn = scala.collection.mutable.Map.empty[String, Long]
        val maxOut = scala.collection.mutable.Map.empty[String, Long]
        hist.foreach { case (a, b, c) =>
          if (maxOut.getOrElse(a, Long.MinValue) < c) maxOut(a) = c
          if (maxIn.getOrElse(b, Long.MinValue) < c) maxIn(b) = c
        }
        val sorted = hist.sortBy { case (a, b, c) => (-c, a, b) }
        var used = Set.empty[String]
        var createdBound = Long.MinValue
        var stop = false
        val it = sorted.iterator
        while (!stop && it.hasNext && merges.length < n) {
          val (a, b, c) = it.next()
          if (used.isEmpty ||
              (!used(a) && !used(b) && c > createdBound)) {
            merges :+= ((a, b))
            used += a; used += b
            createdBound = math.max(createdBound, math.max(
              maxIn.getOrElse(a, Long.MinValue),
              maxOut.getOrElse(b, Long.MinValue)))
          } else stop = true
        }
      }
    }
    merges
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val n = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val merges = train(spark, dir, n)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      println(s"merge ${i + 1}: '$a' + '$b' -> '$a$b'")
    }
    spark.stop()
  }
}
