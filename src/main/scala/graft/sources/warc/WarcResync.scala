package graft.sources.warc

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Split-anywhere reading of UNINDEXED `.warc.gz` (round-16 verdict,
  * "What's missing #2"): a multi-GB member-per-record gzip crawl with
  * no `.wcdx` sidecar and no foreign CDX used to scan as ONE task —
  * the straggler that caps a 100 TB job at the size of its biggest
  * file. These are raw byte-range slices with reader-side MEMBER
  * RESYNC, the same recovery the pcap chunker uses for its framing:
  *
  *   - the planner cuts `[k*maxBytes, (k+1)*maxBytes)` ranges with no
  *     index at all;
  *   - each reader scans its range for the next gzip member magic
  *     (1F 8B 08, RFC 1952) whose header parses and whose inflated
  *     payload begins with `WARC/1.` — a false sync on payload bytes
  *     must pass all three gates, and the first gate alone has
  *     ~2^-24 density on random data;
  *   - a member belongs to the slice that contains its FIRST byte
  *     (the standard Hadoop split contract): the reader inflates
  *     members past its range end until one STARTS at/after the end,
  *     so every member is read exactly once and no split point can
  *     cut a record.
  *
  * Caveat (inherent to any resync heuristic, documented not hidden):
  * a crawl whose captured PAYLOAD embeds a byte-identical well-formed
  * `WARC/1.` gzip member (a crawl of a crawl) can yield a spurious
  * sync inside that payload. The `.wcdx`/CDX paths stay authoritative
  * — this is the no-index fallback only.
  */
private[warc] object WarcResync {

  /** Raw byte-range slices for an unindexed member-gzip file. The
    * first slice starts at 0 (its scan accepts offset 0 immediately);
    * every slice resyncs because a range cut can land mid-member. */
  def planRanges(path: String, fileLen: Long, maxBytes: Long)
      : Seq[WarcFileSlice] = {
    val n = ((fileLen + maxBytes - 1) / maxBytes).toInt
    (0 until n).map { k =>
      val start = k * maxBytes
      WarcFileSlice(path, start,
        math.min(maxBytes, fileLen - start), resync = true)
    }
  }

  /** Inflated bytes of the members starting in `[start, start+len)`,
    * as a stream the ordinary WARC record walk consumes. */
  def openSlice(conf: Configuration, slice: WarcFileSlice)
      : java.io.InputStream = {
    val p = new Path(slice.path)
    val fs = p.getFileSystem(conf)
    val raw = fs.open(p)
    val end = slice.start + slice.length
    val syncAt = findSync(raw, slice.start, end)
    if (syncAt < 0) { raw.close(); return emptyStream }
    raw.seek(syncAt)
    val walker = new WarcCdx.MemberGzipWalker(raw)
    new java.io.InputStream {
      private var cur: Array[Byte] = Array.emptyByteArray
      private var pos = 0
      private var done = false

      private def advance(): Boolean = {
        if (done) return false
        if (!walker.next()) { done = true; return false }
        // members are addressed by their absolute first byte; the
        // walker counts from the sync point
        if (syncAt + walker.memberStart >= end) { done = true; return false }
        cur = walker.payload
        pos = 0
        true
      }

      override def read(): Int = {
        while (pos >= cur.length) if (!advance()) return -1
        val b = cur(pos) & 0xFF
        pos += 1
        b
      }

      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (len == 0) return 0
        while (pos >= cur.length) if (!advance()) return -1
        val n = math.min(len, cur.length - pos)
        System.arraycopy(cur, pos, b, off, n)
        pos += n
        n
      }

      override def close(): Unit = raw.close()
    }
  }

  private def emptyStream: java.io.InputStream =
    new java.io.ByteArrayInputStream(Array.emptyByteArray)

  /** First offset in `[from, end)` where a gzip member whose inflated
    * payload starts with `WARC/1.` begins; -1 if none. */
  private[warc] def findSync(raw: org.apache.hadoop.fs.FSDataInputStream,
      from: Long, end: Long): Long = {
    val bufLen = 1 << 20
    val buf = new Array[Byte](bufLen)
    var base = from
    var have = 0
    var scanned = 0 // bytes of buf already rejected
    raw.seek(from)
    while (base + scanned < end) {
      // top up the buffer (keep 2 spare bytes so the 3-byte magic
      // never straddles a refill boundary)
      if (scanned >= have - 2) {
        val keep = have - scanned
        System.arraycopy(buf, scanned, buf, 0, keep)
        base += scanned
        have = keep
        scanned = 0
        val n = raw.read(buf, have, bufLen - have)
        if (n <= 0 && have < 3) return -1
        if (n > 0) have += n
      }
      var i = scanned
      val limit = math.min(have - 2, (end - base).toInt)
      var found = -1
      while (found < 0 && i < limit) {
        if (buf(i) == 0x1f && buf(i + 1) == 0x8b.toByte && buf(i + 2) == 8)
          found = i
        else i += 1
      }
      if (found < 0) {
        scanned = math.max(limit, 0)
        if (base + scanned >= end || (have < 3 && scanned == 0)) return -1
      } else {
        val cand = base + found
        if (validates(raw, cand)) { raw.seek(cand); return cand }
        scanned = found + 1
      }
    }
    -1
  }

  /** Gate 2+3 at a magic candidate: the gzip header parses and the
    * member's first inflated bytes are `WARC/1.` — checked on a
    * bounded read so a false magic costs a few KB, not a member. */
  private def validates(raw: org.apache.hadoop.fs.FSDataInputStream,
      cand: Long): Boolean = {
    val head = new Array[Byte](1 << 14)
    raw.seek(cand)
    var have = 0
    var r = raw.read(head, 0, head.length)
    while (r > 0 && have + r < head.length) { have += r; r = raw.read(head, have, head.length - have) }
    if (r > 0) have += r
    if (have < 20) return false
    var q = 3 // past magic + method
    if (q >= have) return false
    val flg = head(q) & 0xFF; q += 7 // FLG + MTIME/XFL/OS
    if ((flg & 0xE0) != 0) return false // reserved bits must be 0
    if ((flg & 4) != 0) { // FEXTRA
      if (q + 2 > have) return false
      val xl = (head(q) & 0xFF) | ((head(q + 1) & 0xFF) << 8)
      q += 2 + xl
    }
    if ((flg & 8) != 0) { // FNAME
      while (q < have && head(q) != 0) q += 1
      q += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT
      while (q < have && head(q) != 0) q += 1
      q += 1
    }
    if ((flg & 2) != 0) q += 2 // FHCRC
    if (q >= have) return false
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(head, q, have - q)
      val out = new Array[Byte](16)
      var got = 0
      while (got < 7 && !inf.finished() && !inf.needsInput()) {
        val n = try inf.inflate(out, got, out.length - got)
        catch { case _: java.util.zip.DataFormatException => return false }
        if (n == 0 && inf.needsDictionary()) return false
        got += n
      }
      got >= 7 &&
        out(0) == 'W' && out(1) == 'A' && out(2) == 'R' &&
        out(3) == 'C' && out(4) == '/' && out(5) == '1' && out(6) == '.'
    } finally inf.end()
  }
}
