package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{JpegCodec, Multimodal}

/** DC-only JPEG thumbnail decode (`decodeLumaDcThumbnail`): one gray
  * pixel per luma block, exact (`floor(dc/8 + 128.5)` of the fully
  * refined DC), on both wire formats. The fixture's DC-only
  * reconstruction has a closed form — `yBase` — because the AC basis
  * terms vanish from a flat block, so every thumbnail pixel is pinned
  * without reference to the decoder. The progressive path's honesty
  * property: AC scans are byte-skipped, never entropy-decoded, so
  * corrupting one cannot change (or even fail) the thumbnail, while
  * the full decoder sees the corruption. */
class DcThumbnailSpec extends AnyFunSuite {

  private def expectedThumb(id: Long, w: Int, h: Int): Seq[Seq[Int]] = {
    val tw = (w + 7) / 8; val th = (h + 7) / 8
    Seq.tabulate(th, tw)((by, bx) => JpegCodec.yBase(id, bx, by))
  }

  private def grayOf(img: Multimodal.BmpCodec.Image): Seq[Seq[Int]] =
    Seq.tabulate(img.h, img.w) { (y, x) =>
      val o = (y * img.w + x) * 3
      assert(img.px(o) == img.px(o + 1) && img.px(o) == img.px(o + 2))
      img.px(o) & 0xFF
    }

  test("baseline thumbnail equals the closed-form block DC grid") {
    for (id <- 0L until 24L) {
      val (w, h) = (75 + (id % 21).toInt, 66 + (id % 13).toInt)
      val t = JpegCodec.decodeLumaDcThumbnail(
        JpegCodec.encode(id, dimsOverride = (w, h)))
      assert(t.w == (w + 7) / 8 && t.h == (h + 7) / 8)
      assert(grayOf(t) == expectedThumb(id, w, h), s"id=$id")
    }
  }

  test("progressive thumbnail is bit-identical to baseline's " +
      "(DC refinement scans folded in)") {
    for (id <- 0L until 24L) {
      val (w, h) = (75 + (id % 21).toInt, 66 + (id % 13).toInt)
      val tb = JpegCodec.decodeLumaDcThumbnail(
        JpegCodec.encode(id, dimsOverride = (w, h)))
      val tp = JpegCodec.decodeLumaDcThumbnail(
        JpegCodec.encodeProgressive(id, dimsOverride = (w, h)))
      assert(tp.w == tb.w && tp.h == tb.h)
      assert(grayOf(tp) == grayOf(tb), s"id=$id")
    }
  }

  test("small fixture dims work on both paths (partial MCUs)") {
    for (id <- 0L until 12L) {
      val t = JpegCodec.decodeLumaDcThumbnail(JpegCodec.encode(id))
      val (w, h) = JpegCodec.dims(id)
      assert(t.w == (w + 7) / 8 && t.h == (h + 7) / 8)
      assert(grayOf(t) == expectedThumb(id, w, h))
    }
  }

  test("thumbnail pixel equals the block mean of the full decode's " +
      "luma (the fixture's AC bases are zero-mean)") {
    val id = 7L
    val bytes = JpegCodec.encode(id)
    val full = JpegCodec.decode(bytes)
    val t = JpegCodec.decodeLumaDcThumbnail(bytes)
    // full decode is RGB; recover Y from the known flat chroma via the
    // closed-form luma instead: lumaAt averages to yBase over a block
    val (w, h) = JpegCodec.dims(id)
    for (by <- 0 until t.h; bx <- 0 until t.w) {
      val xs = (bx * 8) until math.min(bx * 8 + 8, w)
      val ys = (by * 8) until math.min(by * 8 + 8, h)
      // mean over the FULL block extent (formula domain), not the crop
      val mean = (for (y <- by * 8 until by * 8 + 8;
                       x <- bx * 8 until bx * 8 + 8)
        yield JpegCodec.lumaAt(id, x, y)).sum / 64
      assert(grayOf(t)(by)(bx) == mean)
      assert(xs.nonEmpty && ys.nonEmpty && full.w == w)
    }
  }

  test("corrupting a progressive AC scan leaves the thumbnail " +
      "untouched (AC scans are byte-skipped, never decoded)") {
    val id = 11L
    val (w, h) = (80, 70)
    val bytes = JpegCodec.encodeProgressive(id, dimsOverride = (w, h))
    val clean = grayOf(JpegCodec.decodeLumaDcThumbnail(bytes))
    // find an AC scan: an SOS (FFDA) whose Ss byte (payload last-2) > 0
    var off = 2
    var acBody = -1
    while (acBody < 0 && off + 4 < bytes.length) {
      if ((bytes(off) & 0xFF) == 0xFF && (bytes(off + 1) & 0xFF) == 0xDA) {
        val len = ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
        val ss = bytes(off + 2 + len - 3) & 0xFF
        if (ss > 0) acBody = off + 2 + len
        else off += 2 + len
      } else off += 1
    }
    assert(acBody > 0, "no AC scan found in progressive stream")
    // flip bits in the scan body, avoiding creating/destroying 0xFF
    val dirty = bytes.clone()
    var flipped = 0
    var p = acBody
    while (flipped < 8 && p + 1 < dirty.length &&
        (dirty(p) & 0xFF) != 0xFF) {
      val cand = (dirty(p) ^ 0x24).toByte
      if ((cand & 0xFF) != 0xFF && (dirty(p) & 0xFF) != 0x00) {
        dirty(p) = cand; flipped += 1
      }
      p += 1
    }
    assert(flipped > 0)
    assert(grayOf(JpegCodec.decodeLumaDcThumbnail(dirty)) == clean)
    // the full decoder DOES see the corruption: decoded pixels change
    // or the stream rejects — either way, not the clean image
    val cleanFull =
      try Some(JpegCodec.decode(bytes).px.toSeq) catch {
        case _: Exception => None }
    val dirtyFull =
      try Some(JpegCodec.decode(dirty).px.toSeq) catch {
        case _: Exception => None }
    assert(cleanFull.isDefined && dirtyFull != cleanFull)
  }
}
