package graft

import org.scalatest.funsuite.AnyFunSuite

/** The property that justifies dedup_cdc_chunk over dedup_chunk:
  * content-defined breakpoints localize edits. Inserting one token at
  * the front of a document re-cuts ONLY the run it lands in (O(1)
  * chunks change); fixed-width chunking shifts every downstream cut,
  * so nearly the whole chunk set changes. Also pins the max-bound
  * subsplit and the boundary rule itself.
  */
class CdcChunkSpec extends AnyFunSuite {

  lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def chunksOf(texts: Seq[String]): Map[Long, Seq[String]] = {
    import spark.implicits._
    operators.Dedup
      .cdcChunks(texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSeq) }
  }

  test("chunks tile the document exactly and respect the 16-token max") {
    val text = (0 until 400).map(i => s"tok${i % 57}").mkString(" ")
    val cs = chunksOf(Seq(text))(0L)
    assert(cs.mkString(" ") === text, "chunks must tile the doc in order")
    assert(cs.forall(c => c.split(" ").length <= 16), "max bound")
  }

  test("boundary rule: every non-final chunk at max<16 ends on a cut token") {
    val text = (0 until 400).map(i => s"tok${i % 57}").mkString(" ")
    val cs = chunksOf(Seq(text))(0L)
    def isCut(tok: String): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = h.map(b => f"${b & 0xFF}%02x").mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 8 == 0
    }
    cs.dropRight(1).foreach { c =>
      val toks = c.split(" ")
      assert(toks.length == 16 || isCut(toks.last),
        s"non-max chunk must end on a content-defined cut: '$c'")
    }
  }

  test("one front-inserted token changes O(1) CDC chunks but ~all fixed chunks") {
    val base = (0 until 600).map(i => s"w${(i * 7) % 113}").mkString(" ")
    val edited = "inserted " + base
    val m = chunksOf(Seq(base, edited))
    val (a, b) = (m(0L), m(1L))
    // multiset symmetric difference
    def ms(x: Seq[String]) = x.groupBy(identity).map { case (k, v) => (k, v.size) }
    val (ma, mb) = (ms(a), ms(b))
    val diff = (ma.keySet ++ mb.keySet).toSeq
      .map(k => math.abs(ma.getOrElse(k, 0) - mb.getOrElse(k, 0))).sum
    // the insertion affects only the first run (≤ 16 tokens → ≤ 2
    // chunks per side after subsplit re-alignment, plus slack for the
    // run growing past a subsplit boundary)
    assert(diff <= 6, s"CDC edit must stay local, changed $diff chunks " +
      s"of ${a.size}/${b.size}")
    // the fixed-width strawman: same texts through 10-token cuts
    def fixed(t: String) = t.split(" ").grouped(10).map(_.mkString(" ")).toSeq
    val (fa, fb) = (ms(fixed(base)), ms(fixed(edited)))
    val fdiff = (fa.keySet ++ fb.keySet).toSeq
      .map(k => math.abs(fa.getOrElse(k, 0) - fb.getOrElse(k, 0))).sum
    assert(fdiff > fixed(base).size,
      "fixed chunking must shift nearly everything (the contrast)")
  }
}
