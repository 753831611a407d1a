package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming C2-beacon detector — the continuous form of the batch
  * `pcap_beacon_candidates` query: captures land, and a flow whose
  * inter-arrival cadence is anomalously regular is emitted once the
  * flow has been idle past the event-time horizon.
  *
  * Periodicity needs ORDERED gaps, and running gap-sums would be
  * corrupted by cross-micro-batch arrival reordering (the
  * [[CorpusBridgeStream]] round-10 lesson), so the per-flow state is
  * the raw observation buffer — just the packet timestamps, 8 bytes
  * each — sorted once at quiescence-close, where the batch detector's
  * integer arithmetic (whole-ms gaps, CV² in basis points as
  * (n·Σg² − (Σg)²)·10000 div (Σg)²) replays exactly. Streamed rows
  * therefore equal the batch twin's BY CONSTRUCTION for any admission
  * order the watermark admits, for flows within the observation cap.
  *
  * Scale shape: one shuffle on the high-cardinality flow key; state is
  * O(active flows) × 8 bytes per observation, capped at [[MaxObs]]
  * timestamps (at a 30 s beacon cadence that is ~5 days of history; a
  * flow past the cap is POISONED — deterministically emits nothing —
  * because which observations survive an overflow would depend on
  * arrival order, and a detector must not alert on order-dependent
  * evidence). Eviction at idle timeout; append-mode alert rows.
  */
object BeaconStream {

  final case class PktIn(src: String, dst: String, dst_port: Int,
      ts_micro: Long, time: java.sql.Timestamp)

  /** Per-flow state: observation timestamps (µs) + the overflow flag. */
  final case class FlowSt(ts: Array[Long], poisoned: Boolean)

  final case class BeaconOut(src: String, dst: String, dst_port: Int,
      n_pkts: Long, period_ms: Long, cv2_bp: Long, is_beacon: Boolean)

  /** Observation cap per flow (8 bytes each in checkpointed state). */
  val MaxObs: Int = 16384

  /** `packets`: streaming DataFrame with the pcap source's schema
    * (`time`, `protocol`, `src`, `dst`, `dst_port`, `ts_micro`).
    * Emits one append-mode row per closed flow with ≥ `minGaps`
    * observed gaps — the batch detector's exact columns and
    * arithmetic. */
  def candidates(packets: DataFrame, watermark: String = "30 seconds",
      idleSeconds: Int = 60, minGaps: Int = 8): DataFrame = {
    val s = packets.sparkSession
    import s.implicits._
    packets
      .filter($"protocol" === "UDP")
      .select($"src", $"dst", $"dst_port", $"ts_micro", $"time")
      .withWatermark("time", watermark)
      .as[PktIn]
      .groupByKey(x => (x.src, x.dst, x.dst_port))
      .flatMapGroupsWithState[FlowSt, BeaconOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((src, dst, dp), _, state) if state.hasTimedOut =>
          val st = state.get
          state.remove()
          if (st.poisoned) Iterator.empty
          else finish(src, dst, dp, st.ts, minGaps)
        case ((_, _, _), rows, state: GroupState[FlowSt]) =>
          val st = state.getOption.getOrElse(
            FlowSt(Array.empty[Long], poisoned = false))
          val fresh = rows.toArray
          var maxEventMs = Long.MinValue
          fresh.foreach { x =>
            val ms = x.time.getTime
            if (ms > maxEventMs) maxEventMs = ms
          }
          val merged =
            if (st.poisoned) st
            else if (st.ts.length + fresh.length > MaxObs)
              FlowSt(Array.empty[Long], poisoned = true)
            else FlowSt(st.ts ++ fresh.map(_.ts_micro), poisoned = false)
          state.update(merged)
          if (maxEventMs > Long.MinValue)
            state.setTimeoutTimestamp(math.max(
              maxEventMs + idleSeconds * 1000L,
              state.getCurrentWatermarkMs() + 1000L))
          Iterator.empty
      }.toDF()
  }

  /** Flow close: sort, gap, and score — the batch plan's integer math
    * (`div` floor-division on positives, CV² in basis points). */
  private def finish(src: String, dst: String, dp: Int,
      ts: Array[Long], minGaps: Int): Iterator[BeaconOut] = {
    val n = ts.length - 1
    if (n < minGaps) return Iterator.empty
    java.util.Arrays.sort(ts)
    var s1 = 0L
    var s2 = 0L
    var i = 1
    while (i < ts.length) {
      val g = (ts(i) - ts(i - 1)) / 1000L
      s1 += g; s2 += g * g; i += 1
    }
    if (s1 == 0L) return Iterator.empty // all-identical timestamps
    val cv2bp = (n * s2 - s1 * s1) * 10000L / (s1 * s1)
    Iterator.single(BeaconOut(src, dst, dp, ts.length.toLong,
      s1 / n, cv2bp, cv2bp <= 100L))
  }
}
