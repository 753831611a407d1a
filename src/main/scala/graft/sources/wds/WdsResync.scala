package graft.sources.wds

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** OPT-IN byte-range splitting of big PLAIN `.tar` shards
  * (`option("resyncSplit","true")`) — the warc chunker discipline
  * applied to the webdataset container: a multi-GB uncompressed shard
  * with no index otherwise scans as one task. Tar gives the resync an
  * easier grammar than gzip/zstd: every header sits on a 512-byte
  * block boundary and carries a checksum, so the scan probes only
  * aligned blocks and validates (ustar magic + checksum), and an
  * entry belongs to the slice containing its HEADER block (first-byte
  * ownership, the Hadoop split contract — cuts inside a payload move
  * the whole entry to the earlier slice, nothing is lost or doubled).
  *
  * Opt-in, NOT default, because tar framing cannot certainly
  * distinguish an embedded tar payload (a sample whose bytes ARE a
  * tar — its first inner header lands 512-aligned in the outer file
  * and checksums clean) from the outer stream; shard lakes storing
  * tar blobs as samples must stay on whole-file planning. Compressed
  * shards (.tar.gz/.tar.zst single streams) cannot split regardless.
  *
  * The served stream re-frames the range as a COMPLETE tar (entries
  * whose header starts in-range, then a synthetic end-of-archive
  * marker), so the ordinary checksum-verifying [[WdsTarWalk]] consumes
  * it unchanged. */
private[wds] object WdsResync {

  /** ustar magic + checksum validation of one 512-byte header block;
    * mirrors [[WdsTarWalk]]'s checks. */
  private def validHeader(hdr: Array[Byte]): Boolean = {
    if (hdr(257) != 'u' || hdr(258) != 's' || hdr(259) != 't' ||
        hdr(260) != 'a' || hdr(261) != 'r') return false
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toByte else hdr(i)) & 0xFF
      i += 1
    }
    val stored = new String(hdr, 148, 6, "US-ASCII").trim
    stored.nonEmpty && stored.forall(c => c >= '0' && c <= '7') &&
      java.lang.Long.parseLong(stored, 8) == sum
  }

  private def entrySize(hdr: Array[Byte]): Long = {
    val s = new String(hdr, 124, 12, "US-ASCII")
      .takeWhile(c => c >= '0' && c <= '7')
    if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
  }

  /** Entries whose header block starts in `[start, start+length)`,
    * re-framed as a complete tar stream. */
  def openSlice(conf: Configuration, slice: WdsSlice)
      : java.io.InputStream = {
    val p = new Path(slice.path)
    val fs = p.getFileSystem(conf)
    val raw = fs.open(p)
    val fileLen = fs.getFileStatus(p).getLen
    val end = math.min(slice.start + slice.length, fileLen)
    val endMark = new Array[Byte](1024)
    val hdr = new Array[Byte](512)

    def readBlockAt(off: Long): Boolean = {
      if (off + 512 > fileLen) return false
      raw.seek(off)
      var got = 0
      while (got < 512) {
        val r = raw.read(hdr, got, 512 - got)
        if (r <= 0) return false
        got += r
      }
      true
    }

    // scan aligned blocks in-range for the first valid header
    var pos = (slice.start + 511) / 512 * 512
    var found = -1L
    while (found < 0 && pos < end && readBlockAt(pos)) {
      if (validHeader(hdr)) found = pos
      else pos += 512
    }
    if (found < 0) {
      raw.close()
      return new java.io.ByteArrayInputStream(endMark)
    }

    // serve entry runs: at each boundary decide continue/stop by the
    // NEXT header's offset and validity
    new java.io.InputStream {
      private var cur: Array[Byte] = Array.emptyByteArray
      private var curPos = 0
      private var at = found // raw offset of the next header block
      private var done = false

      private def advance(): Boolean = {
        if (done) return false
        if (at >= end || !readBlockAt(at) || hdr(0) == 0) {
          // range exhausted, file end, or the real end-of-archive
          // marker: close out with a clean synthetic marker
          done = true
          cur = endMark
          curPos = 0
          return true
        }
        // an INVALID non-zero header mid-chain is corruption (or a
        // false initial sync): fail LOUD like the whole-file walk —
        // treating it as end-of-archive would silently drop the
        // slice's remaining entries (review finding)
        require(validHeader(hdr),
          s"not a valid ustar header at $at in ${p.getName} — " +
            "corrupt shard or tar-in-tar payload false sync; read " +
            "whole-file (resyncSplit=false) to localize")
        val padded = (entrySize(hdr) + 511) / 512 * 512
        val total = 512L + padded
        require(total <= Int.MaxValue && at + total <= fileLen,
          s"tar entry at $at overruns ${p.getName}")
        val buf = new Array[Byte](total.toInt)
        System.arraycopy(hdr, 0, buf, 0, 512)
        raw.seek(at + 512)
        var got = 512
        while (got < total) {
          val r = raw.read(buf, got, (total - got).toInt)
          require(r > 0, s"truncated tar entry at $at in ${p.getName}")
          got += r
        }
        at += total
        cur = buf
        curPos = 0
        true
      }

      override def read(): Int = {
        while (curPos >= cur.length) {
          if (done) return -1
          if (!advance()) return -1
        }
        val b = cur(curPos) & 0xFF
        curPos += 1
        b
      }

      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (len == 0) return 0
        while (curPos >= cur.length) {
          if (done) return -1
          if (!advance()) return -1
        }
        val n = math.min(len, cur.length - curPos)
        System.arraycopy(cur, curPos, b, off, n)
        curPos += n
        n
      }

      override def close(): Unit = raw.close()
    }
  }
}
