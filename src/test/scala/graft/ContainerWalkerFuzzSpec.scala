package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.warc.WarcCdx.{MemberGzipWalker, ZstdFrameWalker}
import graft.sources.warc.WarcSynth

/** Seeded fuzz over the two container walkers the `.wcdx` indexer
  * trusts for offsets: random byte mutations must REJECT or parse
  * bounded — never hang, misallocate, or return units whose extents
  * disagree with the bytes. The walkers' CRC/ISIZE (gzip) and frame-
  * grammar (zstd) checks are the rejection surface. */
class ContainerWalkerFuzzSpec extends AnyFunSuite {

  private def gzipFixture(n: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    WarcSynth.gzipMembers(
      (0 until n).iterator.map(i =>
        WarcSynth.responseRecord(i.toLong)), bos)
    bos.toByteArray
  }

  test("gzip member walk: clean bytes yield exact extents; mutated " +
      "bytes reject or stay within the original unit budget") {
    val good = gzipFixture(12)
    // clean walk: extents tile the file exactly
    val w = new MemberGzipWalker(new java.io.ByteArrayInputStream(good))
    var pos = 0L
    var units = 0
    while (w.next()) {
      assert(w.memberStart == pos, "extents must tile")
      assert(w.memberLen > 0 && w.memberStart + w.memberLen <=
        good.length)
      assert(new String(w.payload, "ISO-8859-1").startsWith("WARC/1.0"))
      pos = w.memberStart + w.memberLen
      units += 1
    }
    assert(units == 12 && pos == good.length)
    // seeded mutations: CRC32 + ISIZE catch payload corruption; header
    // corruption rejects at the magic/flag checks
    val rnd = new scala.util.Random(1515)
    var rejected = 0
    for (_ <- 0 until 300) {
      val mut = good.clone()
      for (_ <- 0 until rnd.nextInt(3) + 1)
        mut(rnd.nextInt(mut.length)) = (rnd.nextInt(256) - 128).toByte
      try {
        val m = new MemberGzipWalker(
          new java.io.ByteArrayInputStream(mut))
        var k = 0
        while (m.next()) {
          k += 1
          assert(k <= 12, "more units than the original")
          assert(m.payload.length <= good.length,
            "implausible inflated size")
        }
      } catch { case _: Exception => rejected += 1 }
    }
    // gzip checksums make near-every mutation detectable (unlike the
    // WARC grammar, whose value bytes legitimately survive)
    assert(rejected > 250, s"only $rejected/300 rejected")
  }

  test("zstd frame walk: clean bytes yield exact extents; mutated " +
      "bytes reject or stay bounded") {
    val bos = new java.io.ByteArrayOutputStream()
    (0 until 10).foreach(i => bos.write(
      com.github.luben.zstd.Zstd.compress(
        WarcSynth.responseRecord(i.toLong))))
    val good = bos.toByteArray
    val w = new ZstdFrameWalker(new java.io.ByteArrayInputStream(good))
    var pos = 0L
    var units = 0
    while (w.next()) {
      assert(w.frameStart == pos, "extents must tile")
      assert(w.frameLen > 0 && w.frameStart + w.frameLen <= good.length)
      pos = w.frameStart + w.frameLen
      units += 1
    }
    assert(units == 10 && pos == good.length)
    val rnd = new scala.util.Random(2626)
    var rejected = 0
    for (_ <- 0 until 300) {
      val mut = good.clone()
      for (_ <- 0 until rnd.nextInt(3) + 1)
        mut(rnd.nextInt(mut.length)) = (rnd.nextInt(256) - 128).toByte
      try {
        val m = new ZstdFrameWalker(new java.io.ByteArrayInputStream(mut))
        var k = 0
        while (m.next()) {
          k += 1
          assert(k <= 10, "more frames than the original")
          assert(m.payload.length <= 4 * good.length,
            "implausible decompressed size")
        }
      } catch { case _: Exception => rejected += 1 }
    }
    // zstd has per-block magic + optional checksums; the frame grammar
    // rejects most mutations, content mutations can survive (no
    // checksum requested at compress time)
    assert(rejected > 150, s"only $rejected/300 rejected")
  }

  test("truncated containers reject at every non-boundary cut point") {
    val gz = gzipFixture(3)
    // member boundaries (where a truncation IS a valid shorter file)
    val bounds = {
      val m = new MemberGzipWalker(new java.io.ByteArrayInputStream(gz))
      val b = Seq.newBuilder[Long]
      while (m.next()) b += m.memberStart + m.memberLen
      b.result().toSet
    }
    for (cut <- Seq(1, 5, gz.length / 3, gz.length / 2, gz.length - 3)
        if !bounds.contains(cut.toLong)) {
      val failed =
        try {
          val m = new MemberGzipWalker(new java.io.ByteArrayInputStream(
            java.util.Arrays.copyOf(gz, cut)))
          while (m.next()) ()
          false // ended cleanly mid-member: a missed truncation
        } catch { case _: Exception => true }
      assert(failed, s"truncation at $cut parsed cleanly")
    }
  }
}
