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
  * Scale shape: the corpus is re-symbolized lazily per iteration by the
  * accumulated replace chain (codegen'd, zero shuffle); only the pair
  * histogram — bounded by (vocab size)^2, tiny — is aggregated and the
  * argmax collected. Driver state is the merge list alone. At 100 TB
  * you'd checkpoint the symbolized corpus every k merges to flatten the
  * replace chain; here the chain stays short.
  *
  * Usage: BpeTrain <sfDir> <nMerges>
  */
object BpeTrain {

  /** Learn `n` merges over `documents.text`; returns them in order. */
  def train(spark: SparkSession, dir: String, n: Int): Seq[(String, String)] = {
    import spark.implicits._
    val base = graft.Tables.documents(spark, dir)
      .select(concat(lit(" "),
        regexp_replace(regexp_replace($"text", " ", "|"), "(.)", "$1 "))
        .as("s"))
    var merges = Vector.empty[(String, String)]
    for (_ <- 1 to n) {
      val chain = merges.foldLeft("s") { case (acc, (a, b)) =>
        s"replace(replace($acc, ' $a $b ', ' $a$b '), ' $a $b ', ' $a$b ')"
      }
      // adjacent symbol pairs of the current symbolization; '|' boundary
      // tokens stay in the sequence so any pair that would cross a word
      // boundary touches a '|' and is dropped
      val best = base.select(expr(s"split(trim($chain), ' ')").as("toks"))
        .select(explode(expr(
          """transform(sequence(1, greatest(size(toks) - 1, 0)),
               i -> struct(element_at(toks, i) AS a,
                           element_at(toks, i + 1) AS b))""")).as("p"))
        .filter($"p.a" =!= "|" && $"p.b" =!= "|")
        .groupBy($"p.a", $"p.b").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) return merges
      merges :+= ((best(0).getString(0), best(0).getString(1)))
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
