package graft.sources.warc

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Split-anywhere reading of UNINDEXED `.warc.gz` AND `.warc.zst`
  * (round-16 verdict, "What's missing #2"): a multi-GB record-per-unit
  * crawl with no `.wcdx` sidecar and no foreign CDX used to scan as
  * ONE task — the straggler that caps a 100 TB job at the size of its
  * biggest file. These are raw byte-range slices with reader-side
  * UNIT RESYNC, the same recovery the pcap chunker uses for its
  * framing:
  *
  *   - the planner cuts `[k*maxBytes, (k+1)*maxBytes)` ranges with no
  *     index at all;
  *   - each reader scans its range for the next unit magic — gzip
  *     member (1F 8B 08, RFC 1952) or zstd frame (28 B5 2F FD,
  *     RFC 8878) — whose framing parses and whose decompressed
  *     payload begins with `WARC/1.`; a false sync on payload bytes
  *     must pass all gates (for zstd the validator resolves and
  *     decodes the WHOLE candidate frame through the frame grammar);
  *   - a unit belongs to the slice that contains its FIRST byte
  *     (the standard Hadoop split contract): the reader decompresses
  *     units past its range end until one STARTS at/after the end,
  *     so every unit is read exactly once and no split point can
  *     cut a record.
  *
  * Caveat (inherent to any resync heuristic, documented not hidden):
  * a crawl whose captured PAYLOAD embeds a byte-identical well-formed
  * `WARC/1.` compression unit (a crawl of a crawl) can yield a
  * spurious sync inside that payload. The `.wcdx`/CDX paths stay
  * authoritative — this is the no-index fallback only.
  */
private[warc] object WarcResync {

  /** Raw byte-range slices for an unindexed member-gzip or
    * frame-zstd file. The first slice starts at 0 (its scan accepts
    * offset 0 immediately); every slice resyncs because a range cut
    * can land mid-unit. */
  def planRanges(path: String, fileLen: Long, maxBytes: Long)
      : Seq[WarcFileSlice] = {
    val n = ((fileLen + maxBytes - 1) / maxBytes).toInt
    (0 until n).map { k =>
      val start = k * maxBytes
      WarcFileSlice(path, start,
        math.min(maxBytes, fileLen - start), resync = true)
    }
  }

  /** One (unitStart, payload) step of a compression-unit walk — the
    * gzip member and zstd frame walkers behind one face. */
  private trait UnitWalk {
    def next(): Boolean
    def unitStart: Long
    def payload: Array[Byte]
  }

  /** Decompressed bytes of the units starting in `[start, start+len)`,
    * as a stream the ordinary WARC record walk consumes. */
  def openSlice(conf: Configuration, slice: WarcFileSlice)
      : java.io.InputStream = {
    val p = new Path(slice.path)
    val fs = p.getFileSystem(conf)
    val raw = fs.open(p)
    val end = slice.start + slice.length
    val zst = {
      val n = p.getName.toLowerCase(java.util.Locale.ROOT)
      n.endsWith(".zst") || n.endsWith(".zstd")
    }
    val syncAt =
      if (zst) findSyncZst(raw, slice.start, end)
      else findSync(raw, slice.start, end)
    if (syncAt < 0) { raw.close(); return emptyStream }
    raw.seek(syncAt)
    val walker: UnitWalk =
      if (zst) {
        val w = new WarcCdx.ZstdFrameWalker(raw)
        new UnitWalk {
          def next(): Boolean = w.next()
          def unitStart: Long = w.frameStart
          def payload: Array[Byte] = w.payload
        }
      } else {
        val w = new WarcCdx.MemberGzipWalker(raw)
        new UnitWalk {
          def next(): Boolean = w.next()
          def unitStart: Long = w.memberStart
          def payload: Array[Byte] = w.payload
        }
      }
    new java.io.InputStream {
      private var cur: Array[Byte] = Array.emptyByteArray
      private var pos = 0
      private var done = false

      private def advance(): Boolean = {
        if (done) return false
        if (!walker.next()) { done = true; return false }
        // units are addressed by their absolute first byte; the
        // walker counts from the sync point
        if (syncAt + walker.unitStart >= end) { done = true; return false }
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

  /** First offset in `[from, end)` where a zstd frame whose
    * decompressed payload starts with `WARC/1.` begins; -1 if none.
    * Validation is the FULL frame grammar: the candidate frame must
    * resolve through findFrameCompressedSize, decode, and open with
    * the record magic — so the scan never misses a true frame whose
    * first block is large, and a payload-embedded magic has to carry
    * an entire well-formed WARC frame to false-sync. */
  private[warc] def findSyncZst(
      raw: org.apache.hadoop.fs.FSDataInputStream,
      from: Long, end: Long): Long =
    scanForUnit(raw, from, end, magicLen = 4,
      (buf, i) => buf(i) == 0x28 && buf(i + 1) == 0xB5.toByte &&
        buf(i + 2) == 0x2F && buf(i + 3) == 0xFD.toByte,
      validatesZst)

  private def validatesZst(raw: org.apache.hadoop.fs.FSDataInputStream,
      cand: Long): Boolean =
    try {
      raw.seek(cand)
      val w = new WarcCdx.ZstdFrameWalker(raw)
      w.next() && w.payload.length >= 7 &&
        w.payload(0) == 'W' && w.payload(1) == 'A' &&
        w.payload(2) == 'R' && w.payload(3) == 'C' &&
        w.payload(4) == '/' && w.payload(5) == '1' && w.payload(6) == '.'
    } catch { case _: Exception => false }

  /** Shared magic scanner: first offset in `[from, end)` where
    * `matches` hits AND `validate` accepts; -1 if none. One
    * implementation so boundary/overflow fixes are single-site
    * (review: the per-format copies each carried an
    * `(end - base).toInt` overflow that spun forever on >= 2 GiB
    * slices). */
  private def scanForUnit(raw: org.apache.hadoop.fs.FSDataInputStream,
      from: Long, end: Long, magicLen: Int,
      matches: (Array[Byte], Int) => Boolean,
      validate: (org.apache.hadoop.fs.FSDataInputStream, Long) => Boolean)
      : Long = {
    val bufLen = 1 << 20
    val buf = new Array[Byte](bufLen)
    var base = from
    var have = 0
    var scanned = 0 // bytes of buf already rejected
    val spare = magicLen - 1 // so the magic never straddles a refill
    raw.seek(from)
    while (base + scanned < end) {
      if (scanned >= have - spare) {
        val keep = have - scanned
        System.arraycopy(buf, scanned, buf, 0, keep)
        base += scanned
        have = keep
        scanned = 0
        val n = raw.read(buf, have, bufLen - have)
        if (n <= 0 && have < magicLen) return -1
        if (n > 0) have += n
      }
      var i = scanned
      // have <= 1 MiB bounds the long min back into Int range — the
      // slice length itself can exceed Int.MaxValue
      val limit = math.min((have - spare).toLong, end - base).toInt
      var found = -1
      while (found < 0 && i < limit) {
        if (matches(buf, i)) found = i
        else i += 1
      }
      if (found < 0) {
        scanned = math.max(limit, 0)
        if (base + scanned >= end ||
            (have < magicLen && scanned == 0)) return -1
      } else {
        val cand = base + found
        if (validate(raw, cand)) { raw.seek(cand); return cand }
        raw.seek(base + have) // validator moved the stream; restore
        scanned = found + 1
      }
    }
    -1
  }

  private def emptyStream: java.io.InputStream =
    new java.io.ByteArrayInputStream(Array.emptyByteArray)

  /** Planning-time gate for resync ranges: true when the file LOOKS
    * member-per-record / frame-per-record — its FIRST compression
    * unit ends within `probe` compressed bytes. A whole-file-gzipped
    * (or single-frame-zstd) archive must KEEP the streaming
    * whole-file plan: the resync reader materializes one unit at a
    * time, which is exactly wrong when the "unit" is the entire
    * archive (review finding — a valid 3 GB single-member file would
    * have hit the 1 GiB unit bomb cap instead of streaming). One
    * bounded head read per big unindexed file, driver-side, only on
    * the straggler path. Mixed archives with a later jumbo unit
    * remain bounded by the walkers' unit cap and fail loud, not
    * silent. */
  private[warc] def unitPerRecord(conf: Configuration, p: Path,
      probe: Int = 4 << 20): Boolean = {
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val want = math.min(probe.toLong,
        fs.getFileStatus(p).getLen).toInt
      val buf = new Array[Byte](want)
      var have = 0
      var r = in.read(buf, 0, want)
      while (r > 0 && have + r < want) {
        have += r
        r = in.read(buf, have, want - have)
      }
      if (r > 0) have += r
      val lower = p.getName.toLowerCase(java.util.Locale.ROOT)
      if (lower.endsWith(".zst") || lower.endsWith(".zstd")) {
        val sz = com.github.luben.zstd.Zstd
          .findFrameCompressedSize(buf, 0, have)
        !com.github.luben.zstd.Zstd.isError(sz) && sz > 0 && sz <= have
      } else {
        // gzip: skip the header, then inflate-and-discard from the
        // probe buffer; the member ends in-probe iff finished()
        var q = 10
        if (have < q + 8 || buf(0) != 0x1f || buf(1) != 0x8b.toByte ||
            buf(2) != 8) return false
        val flg = buf(3) & 0xFF
        if ((flg & 4) != 0) {
          if (q + 2 > have) return false
          q += 2 + ((buf(q) & 0xFF) | ((buf(q + 1) & 0xFF) << 8))
        }
        if ((flg & 8) != 0) { while (q < have && buf(q) != 0) q += 1; q += 1 }
        if ((flg & 16) != 0) { while (q < have && buf(q) != 0) q += 1; q += 1 }
        if ((flg & 2) != 0) q += 2
        if (q >= have) return false
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(buf, q, have - q)
          val sink = new Array[Byte](1 << 16)
          while (!inf.finished() && !inf.needsInput())
            if (inf.inflate(sink) == 0 && inf.needsDictionary()) return false
          inf.finished()
        } catch {
          case _: java.util.zip.DataFormatException => false
        } finally inf.end()
      }
    } catch {
      case _: java.io.IOException => false
    } finally in.close()
  }

  /** First offset in `[from, end)` where a gzip member whose inflated
    * payload starts with `WARC/1.` begins; -1 if none. */
  private[warc] def findSync(raw: org.apache.hadoop.fs.FSDataInputStream,
      from: Long, end: Long): Long =
    scanForUnit(raw, from, end, magicLen = 3,
      (buf, i) => buf(i) == 0x1f && buf(i + 1) == 0x8b.toByte &&
        buf(i + 2) == 8,
      validates)

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
