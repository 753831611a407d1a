package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The TR39 single-codepoint confusable map behind text_homoglyph_fold:
  * alignment/duplicate hygiene of the static table, and an end-to-end
  * fold of Greek- and Cyrillic-spoofed fixtures back to their Latin
  * originals (the round-12 map was a 7-pair Cyrillic subset; the full
  * map must fold BOTH scripts, both cases). */
class ConfusablesSpec extends AnyFunSuite {

  private val C = graft.operators.TextAnalysis.Confusables

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("map hygiene: src/dst aligned, no duplicate sources, every " +
      "target is a Latin letter, both scripts and cases covered") {
    assert(C.src.length == C.dst.length)
    assert(C.src.toSet.size == C.src.length, "duplicate source codepoint")
    assert(C.dst.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
    def block(c: Char) = Character.UnicodeBlock.of(c)
    assert(C.src.exists(c => block(c) == Character.UnicodeBlock.CYRILLIC
      && Character.isLowerCase(c)))
    assert(C.src.exists(c => block(c) == Character.UnicodeBlock.CYRILLIC
      && Character.isUpperCase(c)))
    assert(C.src.exists(c => block(c) == Character.UnicodeBlock.GREEK
      && Character.isLowerCase(c)))
    assert(C.src.exists(c => block(c) == Character.UnicodeBlock.GREEK
      && Character.isUpperCase(c)))
    assert(C.src.length >= 50, s"expected the full set, got ${C.src.length}")
    // no source char maps to itself and none is ASCII
    assert(C.src.forall(_ > 127))
  }

  test("a Greek-spoofed and a Cyrillic-spoofed fixture fold back to " +
      "the original digest through the Spark translate projection") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val original = "Pay Victor AT ONCE: ModelText v2 HYPE"
    // spoof by mapping Latin -> confusable (reverse of the fold), using
    // disjoint subsets for the two scripts
    val greekPairs = C.src.zip(C.dst).filter { case (s, _) =>
      Character.UnicodeBlock.of(s) == Character.UnicodeBlock.GREEK }
    val cyrPairs = C.src.zip(C.dst).filter { case (s, _) =>
      Character.UnicodeBlock.of(s) == Character.UnicodeBlock.CYRILLIC }
    def spoof(text: String, pairs: Seq[(Char, Char)]): String = {
      val rev = pairs.map(_.swap).toMap
      text.map(c => rev.getOrElse(c, c))
    }
    val greekSpoofed = spoof(original, greekPairs)
    val cyrSpoofed = spoof(original, cyrPairs)
    assert(greekSpoofed != original && cyrSpoofed != original)
    assert(greekSpoofed != cyrSpoofed)
    val folded = Seq(greekSpoofed, cyrSpoofed).toDF("t")
      .select(translate($"t", C.src, C.dst).as("f"))
      .collect().map(_.getString(0))
    assert(folded.forall(_ == original),
      s"fold must restore the original: ${folded.mkString(" | ")}")
  }
}
