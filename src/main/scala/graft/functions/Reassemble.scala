package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

import scala.collection.mutable.ArrayBuffer

/** One TCP segment entering a [[ReassembleAgg]] buffer. Field names are
  * the pcap schema's column names so `udaf(...)($"tcp_seq", $"pkt_idx",
  * $"payload")` lines up positionally. */
final case class TcpSeg(tcp_seq: Long, pkt_idx: Long, payload: Array[Byte])

/** A reassembled stream prefix: at most `maxStreamBytes` of seq-ordered
  * payload, plus whether anything past the cap was dropped. */
final case class Reassembled(stream: Array[Byte], truncated: Boolean)

/** Mutable per-flow accumulator. Kryo-encoded (it only crosses the wire
  * at the partial/final boundary; inside ObjectHashAggregate it lives as
  * this object). */
final class ReassemblyBuf extends Serializable {
  var segs: ArrayBuffer[TcpSeg] = ArrayBuffer.empty
  var total: Long = 0L
  var truncated: Boolean = false
}

/** Bounded-memory TCP stream reassembly as a typed `Aggregator` — the
  * scale-safe replacement for the unbounded
  * `aggregate(array_sort(collect_list(...)))` SQL fold
  * ([[graft.operators.PcapQueries.reassembleExpr]], kept as the spec's
  * reference twin): that fold materializes a flow's ENTIRE segment list
  * and concatenated stream in one aggregation buffer, so a single
  * elephant flow (a multi-GB transfer inside a capture) OOMs its task.
  *
  * Semantics on the kept prefix are bit-identical to the fold
  * (ReassemblyCapSpec proves it query-for-query): segments sort by
  * (tcp_seq, pkt_idx); an exact retransmit (duplicate tcp_seq) keeps the
  * earliest capture copy; the stream is the in-order concatenation. The
  * cap keeps whole segments while the running length stays within
  * `maxStreamBytes` and drops everything from the first overflowing
  * segment on — a strict prefix, never a gap — flagging `truncated`.
  *
  * Memory bound, by construction: each partial buffer compacts
  * (sort + dedup + cap) whenever its raw payload exceeds 2×cap or its
  * segment count exceeds `maxSegments`, so no task ever holds more than
  * ~2× `maxStreamBytes` (+ entry overhead) per flow, map-side partials
  * included. Compaction is safe under any partitioning: segments are
  * only ever added, so a segment beyond the cap now is beyond the cap in
  * every superset of the buffer (byte positions only grow), and
  * duplicate eviction keeps the globally-smallest pkt_idx because every
  * copy re-competes at merge time.
  *
  * `truncated` is monotone (once set it survives merge) and only set
  * when a NON-duplicate segment is dropped. One documented edge: a
  * retransmit that changes the payload length at the exact cap boundary
  * can shift which segment overflows first; exact retransmits (the
  * fold's contract, PcapTcpReassemblySpec) are unaffected.
  */
class ReassembleAgg(maxStreamBytes: Long, maxSegments: Int = 1 << 18)
  extends Aggregator[TcpSeg, ReassemblyBuf, Reassembled] {

  require(maxStreamBytes > 0 && maxSegments > 0)

  private def compact(b: ReassemblyBuf): Unit = {
    val sorted = b.segs.sortInPlaceWith { (a, c) =>
      a.tcp_seq < c.tcp_seq ||
        (a.tcp_seq == c.tcp_seq && a.pkt_idx < c.pkt_idx)
    }
    val out = new ArrayBuffer[TcpSeg](math.min(sorted.length, maxSegments))
    var lastSeq = 0L
    var any = false
    var bytes = 0L
    var dropped = false
    var i = 0
    while (i < sorted.length && !dropped) {
      val s = sorted(i)
      if (any && s.tcp_seq == lastSeq) {
        // exact-retransmit duplicate: earliest pkt_idx already kept
      } else if (bytes + s.payload.length > maxStreamBytes ||
          out.length >= maxSegments) {
        dropped = true                  // prefix ends HERE; rest is out
      } else {
        out += s
        bytes += s.payload.length
        lastSeq = s.tcp_seq
        any = true
      }
      i += 1
    }
    b.segs = out
    b.total = bytes
    b.truncated ||= dropped
  }

  override def zero: ReassemblyBuf = new ReassemblyBuf

  override def reduce(b: ReassemblyBuf, s: TcpSeg): ReassemblyBuf = {
    b.segs += s
    b.total += s.payload.length
    if (b.total > maxStreamBytes * 2 || b.segs.length > maxSegments * 2)
      compact(b)
    b
  }

  override def merge(a: ReassemblyBuf, b: ReassemblyBuf): ReassemblyBuf = {
    a.segs ++= b.segs
    a.total += b.total
    a.truncated ||= b.truncated
    if (a.total > maxStreamBytes * 2 || a.segs.length > maxSegments * 2)
      compact(a)
    a
  }

  override def finish(b: ReassemblyBuf): Reassembled = {
    compact(b)
    val stream = new Array[Byte](b.total.toInt)
    var off = 0
    b.segs.foreach { s =>
      System.arraycopy(s.payload, 0, stream, off, s.payload.length)
      off += s.payload.length
    }
    Reassembled(stream, b.truncated)
  }

  override def bufferEncoder: Encoder[ReassemblyBuf] =
    Encoders.kryo[ReassemblyBuf]
  override def outputEncoder: Encoder[Reassembled] =
    ExpressionEncoder[Reassembled]()
}

object Reassemble {
  /** Default per-flow stream cap. Generous for L7 header extraction
    * (requests, TLS hellos, response status lines all live in the first
    * bytes) while bounding an elephant flow's buffer to single-digit
    * MBs. */
  val DefaultMaxStreamBytes: Long = 8L << 20

  /** `struct(stream BINARY, truncated BOOLEAN)` aggregation column over
    * (`tcp_seq`, `pkt_idx`, `payload`). */
  def stream(maxStreamBytes: Long = DefaultMaxStreamBytes): Column =
    functions.udaf(new ReassembleAgg(maxStreamBytes),
        Encoders.product[TcpSeg])
      .apply(functions.col("tcp_seq"), functions.col("pkt_idx"),
        functions.col("payload"))
}
