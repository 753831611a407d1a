package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** text_winnow_fingerprint must implement REAL winnowing (Schleimer/
  * Wilkerson/Aiken 2003): the window-function formulation is checked
  * doc-for-doc against an independently written direct implementation
  * (slide the window, take the rightmost min), and the paper's
  * detection guarantee is exercised on constructed documents. */
class WinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val K = 3 // tokens per gram
  private val W = 4 // hashes per window

  /** Same engine-portable hash the query uses: first 8 hex digits of
    * md5 as an unsigned integer. */
  private def gramHash(gram: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8"))
        .map(b => f"${b & 0xFF}%02x").mkString.substring(0, 8), 16)

  /** Direct winnowing: k-gram hashes, windows of W, rightmost min per
    * window, dedup. Returns (1-based gram pos, hash). Tokenizes with
    * limit -1 to match Spark/DuckDB split semantics (trailing empty
    * tokens kept — Java's default split drops them and would silently
    * diverge on trailing whitespace). */
  private def winnow(text: String): Set[(Int, Long)] = {
    val t = text.toLowerCase.split("\\s+", -1)
    if (t.length < K) return Set.empty
    val h = (0 to t.length - K)
      .map(i => gramHash(t.slice(i, i + K).mkString(" ")))
    if (h.length < W) return Set.empty
    (0 to h.length - W).flatMap { i =>
      val win = h.slice(i, i + W)
      val m = win.min
      val right = (W - 1 to 0 by -1).find(j => win(j) == m).get
      Some((i + right + 1, h(i + right)))
    }.toSet
  }

  test("window-function query equals the direct algorithm, every doc") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("text_winnow_fingerprint")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val expect = winnow(text)
      assert(got.getOrElse(id, Set.empty) == expect,
        s"doc $id: query fingerprints != direct winnowing")
    }
    // density sanity: winnowing keeps ~2/(w+1) of hashes, never all
    val totalGrams = docs.valuesIterator
      .map(t => math.max(t.split("\\s+").length - K + 1, 0)).sum
    val kept = got.valuesIterator.map(_.size).sum
    assert(kept > 0 && kept < totalGrams / 2,
      s"implausible fingerprint density: $kept of $totalGrams")
  }

  test("detection guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    // two documents sharing EXACTLY a 6-token run (w+k-1 = 6) amid
    // otherwise disjoint vocabulary must share at least one selected
    // fingerprint — the paper's theorem 1; and two documents with no
    // shared 3-gram share none
    val shared = "lorem ipsum dolor sit amet consectetur"
    val a = s"alpha beta gamma $shared delta epsilon"
    val b = s"uno dos tres $shared cuatro cinco seis"
    val fa = winnow(a).map(_._2)
    val fb = winnow(b).map(_._2)
    assert((fa & fb).nonEmpty, "guaranteed match was missed")
    val c = winnow("one two three four five six seven eight nine ten")
    val dDoc = winnow("zig zag zip zap zoom zest zeal zero zone zinc")
    assert((c.map(_._2) & dDoc.map(_._2)).isEmpty,
      "disjoint documents must not collide")
  }
}
