package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BinPack

/** The shared whole-file packer behind pcap/wds partition planning:
  * validity (every file exactly once, bins under the target unless a
  * single jumbo) and planning cost (the O(n²) first-fit it replaced
  * needed ~5×10⁹ comparisons at 100k same-size files; the TreeMap
  * best-fit must plan that in well under a second). */
class BinPackSpec extends AnyFunSuite {

  test("every item lands exactly once; bins respect the target; " +
      "jumbos get singleton bins") {
    val rnd = new scala.util.Random(7)
    val items = (0 until 5000).map(i => i -> (rnd.nextInt(40_000_000) + 1L))
    val max = 64L << 20
    val open = 4L << 20
    val bins = BinPack.pack(items, max, open)
    assert(bins.flatten.sorted == (0 until 5000))
    val sizeOf = items.toMap
    bins.foreach { b =>
      val total = b.map(i => sizeOf(i) + open).sum
      assert(b.length == 1 || total <= max,
        s"multi-file bin over target: $total")
    }
    // jumbo: larger than the target alone
    val jumbo = BinPack.pack(Seq(("big", 2L * max), ("small", 10L)),
      max, open)
    assert(jumbo.exists(_ == Seq("big")))
  }

  test("100k-file lake plans in well under a second (the quadratic " +
      "first-fit worst case was shards just over half the target)") {
    // worst case for first-fit: every file just over half the target,
    // so no bin ever accepts a second file and every placement scanned
    // every open bin — O(n²/2)
    val target = 128L << 20
    val items = (0 until 100_000).map(i => i -> (target / 2 + 1024))
    val t0 = System.nanoTime()
    val bins = BinPack.pack(items, target, 0L)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(bins.length == 100_000)
    assert(ms < 1000, f"planning took $ms%.0f ms")
  }

  test("best-fit packs a mixed lake tightly (sanity: not one file per " +
      "bin when files are small)") {
    val items = (0 until 1000).map(i => i -> 1_000_000L)
    val bins = BinPack.pack(items, 100L << 20, 0L)
    assert(bins.length <= 10)
  }
}
