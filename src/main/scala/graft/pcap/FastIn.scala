package graft.pcap

import java.io.{IOException, InputStream}

/** Unsynchronized buffered reader for the per-packet hot loop.
  *
  * The container readers issue two tiny reads per packet (16-byte record
  * header + frame body). Through `DataInputStream` over
  * `BufferedInputStream` each read crosses a synchronized method — two
  * uncontended monitor acquisitions per packet, which is measurable at
  * 25-30 M packets/s (JDK 17 has no biased locking). This class serves
  * `readFully` straight out of a private 128 KiB buffer with plain field
  * access and refills from the underlying stream in large chunks, so the
  * remaining lock cost is amortized over the refill size.
  *
  * EOF contract (mirrors what the readers previously derived from
  * `DataInputStream.readFully` throwing `EOFException`): `readFully`
  * returns false when the stream ends before `dst` is filled — whether
  * cleanly at a record boundary or mid-record — and `eof` is then true.
  * An underlying `IOException` also yields false but leaves `eof` false,
  * preserving the "couldn't read PCAP header" vs "empty file" split in
  * [[PcapStreamReader]].
  */
private[pcap] final class FastIn(in: InputStream, bufSize: Int = 1 << 17) {
  private val buf = new Array[Byte](bufSize)
  private var pos = 0
  private var lim = 0
  /** true once the underlying stream reported end-of-stream */
  var eof = false

  /** Ensure at least one byte is buffered; false on EOF/IOException. */
  private def fill(): Boolean = {
    if (pos < lim) return true
    try {
      val n = in.read(buf, 0, buf.length)
      if (n < 0) { eof = true; false }
      else { pos = 0; lim = n; n > 0 || fill() }
    } catch { case _: IOException => false }
  }

  /** Fill `dst` completely; false (with `eof` set on end-of-stream) when
    * the stream ends or errors first. */
  def readFully(dst: Array[Byte]): Boolean = readFully(dst, dst.length)

  /** Fill `dst[0, len)`; same contract as [[readFully]]. */
  def readFully(dst: Array[Byte], len: Int): Boolean = {
    var off = 0
    while (off < len) {
      if (!fill()) return false
      val n = math.min(lim - pos, len - off)
      System.arraycopy(buf, pos, dst, off, n)
      pos += n
      off += n
    }
    true
  }

  /** Skip exactly `n` bytes; false when the stream ends first. */
  def skipFully(n: Long): Boolean = {
    var left = n
    while (left > 0) {
      if (!fill()) return false
      val k = math.min((lim - pos).toLong, left)
      pos += k.toInt
      left -= k
    }
    true
  }
}
