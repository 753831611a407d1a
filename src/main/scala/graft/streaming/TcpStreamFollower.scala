package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted piece of a followed TCP stream: `chunk` holds the bytes
  * from stream offset `offset`; `truncated` marks the chunk that hit the
  * per-flow cap (nothing further is emitted for that flow). */
final case class TcpChunk(src: String, dst: String, src_port: Int,
    dst_port: Int, offset: Long, chunk: Array[Byte], truncated: Boolean)

/** Continuous TCP stream following with `flatMapGroupsWithState` — the
  * stateful-streaming answer the batch reassembly's doc comment defers
  * to. Where the batch path ([[graft.functions.ReassembleAgg]]) folds a
  * CLOSED capture per flow, this follows LIVE flows on a landing stream
  * and emits each flow's payload as bounded in-order chunks the moment
  * segments arrive.
  *
  * Contract (the streaming twin of the batch aggregator, spec-matched
  * against it on in-order fixtures by TcpFollowerSpec): segments of a
  * micro-batch process in (tcp_seq, pkt_idx) order against a coverage
  * frontier (next expected seq). A segment entirely at-or-below the
  * frontier (exact retransmit, sub-range re-send, or out-of-order
  * arrival straddling a micro-batch boundary) is dropped; a segment
  * straddling it has its covered prefix trimmed and only the new tail
  * is emitted (first-copy-wins, matching [[graft.functions.ReassembleAgg]]);
  * in-order captures reassemble byte-identically to the batch
  * aggregator. Cross-batch out-of-order recovery is deliberately out of
  * scope: buffering gaps would reintroduce the unbounded state the cap
  * exists to prevent; for out-of-order archives the batch fold is the
  * right tool.
  *
  * State per flow is THREE scalars (next expected seq, emitted byte
  * count, truncated) — no segment buffering ever — and an event-time
  * timeout evicts idle flows past the watermark, so total state is
  * O(active flows), not O(stream bytes). Each flow stops emitting at
  * `maxStreamBytes` with a final `truncated` chunk, mirroring the batch
  * cap's prefix semantics.
  *
  * Idle-eviction caveat: once a flow's state is evicted (no segment for
  * `idleSeconds` of event time), a LATER segment of the same 4-tuple
  * starts a NEW follow session — its chunks restart at offset 0 and its
  * seq frontier resets, so a long-idle flow that resumes (or a reused
  * ephemeral port) produces a second, independent chunk sequence.
  * Consumers that concatenate by offset must treat an offset-0 chunk as
  * a session boundary. Retaining tombstones past eviction would make
  * resumed flows continue their offsets, but only by growing state with
  * every flow ever seen — the opposite of what eviction is for.
  */
object TcpStreamFollower {

  final case class SegIn(src: String, dst: String, src_port: Int,
      dst_port: Int, tcp_seq: Long, pkt_idx: Long, payload: Array[Byte],
      time: java.sql.Timestamp)

  /** (next expected seq — the coverage frontier, bytes emitted, cap
    * hit). `nextSeq` is Long.MinValue until the first segment. */
  final case class FlowSt(nextSeq: Long, emitted: Long, truncated: Boolean)

  /** `packets`: streaming DataFrame with `time`, the flow key columns,
    * `tcp_seq`, `pkt_idx`, `payload` (the pcap source's schema). Emits
    * append-mode [[TcpChunk]] rows. `idleSeconds` evicts a flow's state
    * that long after its last segment's event time. */
  def follow(packets: DataFrame,
      maxStreamBytes: Long = graft.functions.Reassemble.DefaultMaxStreamBytes,
      watermark: String = "30 seconds",
      idleSeconds: Int = 60): DataFrame = {
    import packets.sparkSession.implicits._
    val typed = packets
      .filter($"protocol" === "TCP" && $"tcp_seq".isNotNull &&
        $"payload".isNotNull)
      .withWatermark("time", watermark)
      .select($"src", $"dst", $"src_port", $"dst_port", $"tcp_seq",
        $"pkt_idx", $"payload", $"time")
      .as[SegIn]
    typed.groupByKey(s => (s.src, s.dst, s.src_port, s.dst_port))
      .flatMapGroupsWithState[FlowSt, TcpChunk](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, _, state) if state.hasTimedOut =>
          state.remove()            // chunks already emitted; just evict
          Iterator.empty
        case ((src, dst, sp, dp), rows, state: GroupState[FlowSt]) =>
          val segs = rows.toArray.sortInPlaceWith { (a, b) =>
            a.tcp_seq < b.tcp_seq ||
              (a.tcp_seq == b.tcp_seq && a.pkt_idx < b.pkt_idx)
          }
          var st = state.getOption.getOrElse(
            FlowSt(Long.MinValue, 0L, truncated = false))
          val buf = new java.io.ByteArrayOutputStream()
          val offset = st.emitted
          var sawTrunc = false
          var maxEventMs = Long.MinValue
          segs.foreach { s =>
            val ms = s.time.getTime
            if (ms > maxEventMs) maxEventMs = ms
            val effEnd = s.tcp_seq + s.payload.length
            if (!st.truncated && effEnd > st.nextSeq) {
              // trim the covered prefix of an overlapping retransmit
              // (first-copy-wins, mirroring ReassembleAgg's sweep);
              // fully-covered segments fail the effEnd check above
              val trim =
                if (st.nextSeq == Long.MinValue || s.tcp_seq >= st.nextSeq) 0
                else (st.nextSeq - s.tcp_seq).toInt
              val len = s.payload.length - trim
              // segment-granular cap, exactly like ReassembleAgg's
              // compact: the first overflowing segment is dropped WHOLE
              // and the flow stops — a strict prefix, never a partial
              // segment
              if (st.emitted + len > maxStreamBytes) {
                sawTrunc = true
                st = st.copy(truncated = true)
              } else {
                buf.write(s.payload, trim, len)
                st = FlowSt(effEnd, st.emitted + len, truncated = false)
              }
            }
          }
          state.update(st)
          if (maxEventMs > Long.MinValue)
            state.setTimeoutTimestamp(maxEventMs + idleSeconds * 1000L)
          // a zero-byte truncation marker still emits, so the cap event
          // is visible even when no bytes preceded it in this batch
          if (buf.size() > 0 || sawTrunc)
            Iterator.single(
              TcpChunk(src, dst, sp, dp, offset, buf.toByteArray, sawTrunc))
          else Iterator.empty
      }.toDF()
  }
}
