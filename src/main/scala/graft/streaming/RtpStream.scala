package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming RTP stream-quality monitor — the continuous form of the
  * batch `pcap_rtp_quality` rollup: per SSRC, delivered/lost packet
  * counts and the exact integer interarrival-deviation sum/max, emitted
  * at event-time quiescence (a media stream that has gone idle for
  * `idleSeconds` is over).
  *
  * == Order-independent jitter state ==
  *
  * The batch twin defines D between CONSECUTIVE-BY-SEQ delivered
  * packets, but stream arrival order is not seq order (reordering,
  * retransmission across micro-batches). Folding D in arrival order
  * would be wrong the moment one packet arrives late — the round-10
  * corpus-bridge lesson. State is therefore a sorted list of seq RUNS
  * (the TCP-reassembly compaction discipline): each run covers a
  * contiguous delivered seq interval and carries its endpoints'
  * (rtp-clock, arrival) pairs plus the run-internal |D| sum/max. A
  * packet merges into a neighboring run ONLY when seq-adjacent
  * (nothing can ever land between hi and hi+1); runs separated by a
  * gap stay separate until close, because a late packet may still
  * land inside the gap and split the boundary D-term. At quiescence
  * the surviving runs fold left-to-right with the same merge — the
  * boundary terms across (now permanent) loss gaps — which reproduces
  * the batch seq-ordered fold EXACTLY, for ANY arrival order.
  *
  * Duplicated seqs drop (first delivery wins — within a run the value
  * is already folded; the batch twin's fixture has no duplicates).
  * 16-bit seq wraparound is out of scope, matching the twin. A stream
  * whose run list exceeds [[MaxRuns]] (pathological interleaved loss +
  * reordering) is POISONED — state drops to a flag and the stream
  * emits nothing, the corpus bridge's overflow honesty rule — rather
  * than letting state grow O(packets).
  *
  * Single-packet edge: the stream reports 0 jitter where the batch
  * twin's SUM/MAX over an empty D set is NULL; the twin-equality
  * contract is over streams with >= 2 delivered packets.
  *
  * [[graft.pcap.Decap.rtp]] is the ONLY parser on both paths (the
  * key extraction and the state fold both call it), so stream and
  * batch cannot drift on wire-format interpretation.
  */
object RtpStream {

  /** One input row: raw payload + capture micros + event time. */
  final case class RtIn(payload: Array[Byte], arrUs: Long,
      time: java.sql.Timestamp)

  /** One contiguous delivered-seq run in checkpointed state. */
  final case class Run(lo: Int, hi: Int, firstTs: Long, firstArr: Long,
      lastTs: Long, lastArr: Long, sumAbsD: Long, maxAbsD: Long, n: Long)

  final case class RtSt(pt: Int, runs: List[Run], poisoned: Boolean)

  final case class RtOut(ssrc: Long, pt: Int, n_received: Long,
      n_lost: Long, jitter_sum_us: Long, jitter_max_us: Long)

  /** Run-list bound; past it the stream poisons (see object doc). */
  val MaxRuns = 256

  /** Merge two runs with a.hi < b.lo, adding the boundary D-term
    * between a's last and b's first delivered packet. */
  private def merge(a: Run, b: Run): Run = {
    val d = math.abs((b.firstArr - a.lastArr) - (b.firstTs - a.lastTs))
    Run(a.lo, b.hi, a.firstTs, a.firstArr, b.lastTs, b.lastArr,
      a.sumAbsD + b.sumAbsD + d,
      math.max(math.max(a.maxAbsD, b.maxAbsD), d), a.n + b.n)
  }

  /** Insert one delivered packet into the sorted run list; duplicate
    * seqs drop; only seq-adjacent merges happen here. */
  private[graft] def insert(runs: List[Run], seq: Int, ts: Long,
      arr: Long): List[Run] = {
    val (before, rest) = runs.span(_.hi < seq)
    if (rest.headOption.exists(_.lo <= seq)) runs // duplicate delivery
    else {
      var nr = Run(seq, seq, ts, arr, ts, arr, 0L, 0L, 1L)
      var pre = before
      if (pre.nonEmpty && pre.last.hi + 1 == seq) {
        nr = merge(pre.last, nr); pre = pre.init
      }
      var post = rest
      if (post.nonEmpty && seq + 1 == post.head.lo) {
        nr = merge(nr, post.head); post = post.tail
      }
      pre ::: nr :: post
    }
  }

  // ------------------------------------------------------------------
  // streaming audio-level monitor (the MEDIA companion — round 12)
  // ------------------------------------------------------------------

  /** One input row for the level monitor. */
  final case class AlIn(payload: Array[Byte], time: java.sql.Timestamp)

  /** Per-SSRC level state: every accumulator is commutative (count /
    * sum / max), so unlike the jitter monitor above, arrival order is
    * irrelevant BY CONSTRUCTION — no run list, no poison bound. */
  final case class AlSt(pt: Int, nPkts: Long, nSamples: Long,
      peak: Int, sumAbs: Long)

  final case class AlOut(ssrc: Long, pt: Int, n_pkts: Long,
      n_samples: Long, peak: Int, sum_abs: Long)

  /** Streaming form of the batch `pcap_rtp_audio_level` rollup: the
    * RFC 3551 audio payloads (pt 0 µ-law / 8 A-law / 5 DVI4 ADPCM)
    * expand through the ONE shared per-packet decoder
    * ([[graft.operators.PcapQueries.rtpAudioStats]] — batch and stream
    * cannot drift on wire format) into per-SSRC level stats — the
    * continuous dead-air / hot-mic monitor. DVI4's per-packet state
    * header is what makes the per-packet fold order-free even for the
    * stateful codec: every packet decodes independently. One
    * append-mode row per stream at event-time quiescence. */
  def audioLevels(packets: DataFrame, rtpPort: Int = 40002,
      watermark: String = "30 seconds", idleSeconds: Int = 60)
      : DataFrame = {
    val s = packets.sparkSession
    import s.implicits._
    import org.apache.spark.sql.functions._
    packets
      .filter($"protocol" === "UDP" && $"dst_port" === rtpPort &&
        $"payload".isNotNull)
      .select($"payload", $"time")
      .withWatermark("time", watermark)
      .as[AlIn]
      // non-RTP / non-audio payloads key to -1: no state, but their
      // event times still advance the watermark (flush traffic)
      .groupByKey(x =>
        graft.operators.PcapQueries.rtpAudioStats(x.payload)
          .map(_._1).getOrElse(-1L))
      .flatMapGroupsWithState[AlSt, AlOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (ssrc, _, state) if state.hasTimedOut =>
          val st = state.get
          state.remove()
          Iterator.single(AlOut(ssrc, st.pt, st.nPkts, st.nSamples,
            st.peak, st.sumAbs))
        case (ssrc, rows, state: GroupState[AlSt]) =>
          if (ssrc < 0) Iterator.empty
          else {
            var maxEventMs = Long.MinValue
            var st = state.getOption.getOrElse(AlSt(0, 0L, 0L, 0, 0L))
            rows.foreach { x =>
              val ms = x.time.getTime
              if (ms > maxEventMs) maxEventMs = ms
              graft.operators.PcapQueries.rtpAudioStats(x.payload)
                .foreach { case (_, pt, n, pk, sa) =>
                  st = AlSt(pt, st.nPkts + 1, st.nSamples + n,
                    math.max(st.peak, pk), st.sumAbs + sa)
                }
            }
            state.update(st)
            if (maxEventMs > Long.MinValue)
              state.setTimeoutTimestamp(math.max(
                maxEventMs + idleSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1000L))
            Iterator.empty
          }
      }.toDF()
  }

  /** `packets`: streaming DataFrame with the pcap source's schema.
    * One append-mode quality row per RTP stream at event-time
    * quiescence — the batch `pcap_rtp_quality` row set. */
  def reports(packets: DataFrame, rtpPort: Int = 40000,
      watermark: String = "30 seconds", idleSeconds: Int = 60)
      : DataFrame = {
    val s = packets.sparkSession
    import s.implicits._
    import org.apache.spark.sql.functions._
    packets
      .filter($"protocol" === "UDP" && $"dst_port" === rtpPort &&
        $"payload".isNotNull)
      .select($"payload", $"ts_micro".as("arrUs"), $"time")
      .withWatermark("time", watermark)
      .as[RtIn]
      // non-RTP payloads key to -1: no state is ever allocated for
      // them, but they still advance the watermark (flush traffic)
      .groupByKey(x => graft.pcap.Decap.rtp(x.payload)
        .map(_.ssrc).getOrElse(-1L))
      .flatMapGroupsWithState[RtSt, RtOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (ssrc, _, state) if state.hasTimedOut =>
          val st = state.get
          state.remove()
          if (st.poisoned || st.runs.isEmpty) Iterator.empty
          else {
            val f = st.runs.reduceLeft(merge) // gap boundaries close here
            Iterator.single(RtOut(ssrc, st.pt, f.n,
              (f.hi - f.lo + 1).toLong - f.n, f.sumAbsD, f.maxAbsD))
          }
        case (ssrc, rows, state: GroupState[RtSt]) =>
          if (ssrc < 0) Iterator.empty // no state; the rows' event
          // times still advance the watermark (flush traffic)
          else {
            var maxEventMs = Long.MinValue
            var st = state.getOption.getOrElse(
              RtSt(0, Nil, poisoned = false))
            rows.foreach { x =>
              val ms = x.time.getTime
              if (ms > maxEventMs) maxEventMs = ms
              if (!st.poisoned)
                graft.pcap.Decap.rtp(x.payload).foreach { r =>
                  val runs = insert(st.runs, r.seq, r.rtpTs * 125L,
                    x.arrUs)
                  st =
                    if (runs.length > MaxRuns)
                      RtSt(st.pt, Nil, poisoned = true)
                    else RtSt(math.max(st.pt, r.pt), runs,
                      poisoned = false)
                }
            }
            state.update(st)
            if (maxEventMs > Long.MinValue)
              state.setTimeoutTimestamp(math.max(
                maxEventMs + idleSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1000L))
            Iterator.empty
          }
      }.toDF()
  }
}
