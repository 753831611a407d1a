package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming newly-observed-domain (NOD) feed — the threat-intel
  * staple: alert the FIRST time any domain name is ever seen on the
  * wire. Continuous form of the batch `pcap_nod_twin` query
  * (global min-timestamp per name).
  *
  * "First" is an event-time claim, and the first-arriving observation
  * is not necessarily the event-time-earliest one when capture files
  * are admitted out of order — so a name does NOT alert on arrival.
  * Its state holds the running event-time minimum, and the alert emits
  * at watermark quiescence (`EventTimeTimeout` after `idleSeconds` of
  * event-time silence for that name), by which point every observation
  * the watermark admits has been folded in: the emitted row equals the
  * batch twin's BY CONSTRUCTION. After emission the state collapses to
  * a TOMBSTONE (8-byte min, no re-alert) — a later re-observation of a
  * known name refreshes nothing and emits nothing.
  *
  * Scale shape: one shuffle on the name key; state is O(distinct
  * names ever observed) × ~the name bytes — the NOD problem's
  * inherent memory (production deployments bound it with a TTL'd
  * allowlist or a Bloom front; here the tombstone IS the dedup, and
  * the state-store checkpoint makes the "ever" durable across
  * restarts). Append-mode alert rows.
  */
object NodStream {

  final case class NodIn(rrname: String, ts: Long,
      time: java.sql.Timestamp)

  /** Per-name state: running event-time min; `emitted` tombstones the
    * name after its alert fires. */
  final case class NodSt(minTs: Long, emitted: Boolean)

  final case class NodOut(rrname: String, first_seen: Long)

  /** `packets`: streaming DataFrame with the pcap source's schema
    * (`time`, `dns_qr`, `dns_qname`, `ts`). Emits one append-mode
    * (rrname, first_seen) row per domain, at event-time quiescence. */
  def alerts(packets: DataFrame, watermark: String = "30 seconds",
      idleSeconds: Int = 60): DataFrame = {
    val s = packets.sparkSession
    import s.implicits._
    packets
      .filter($"dns_qr" === true && $"dns_qname".isNotNull)
      .select($"dns_qname".as("rrname"), $"ts", $"time")
      .withWatermark("time", watermark)
      .as[NodIn]
      .groupByKey(_.rrname)
      .flatMapGroupsWithState[NodSt, NodOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (name, _, state) if state.hasTimedOut =>
          val st = state.get
          if (st.emitted) { state.remove(); Iterator.empty }
          else {
            state.update(NodSt(st.minTs, emitted = true))
            // keep the tombstone alive indefinitely: no further timeout
            // is set, and a re-observation batch refreshes nothing
            Iterator.single(NodOut(name, st.minTs))
          }
        case (_, rows, state: GroupState[NodSt]) =>
          val st = state.getOption.getOrElse(
            NodSt(Long.MaxValue, emitted = false))
          var minTs = st.minTs
          var maxEventMs = Long.MinValue
          rows.foreach { x =>
            if (!st.emitted && x.ts < minTs) minTs = x.ts
            val ms = x.time.getTime
            if (ms > maxEventMs) maxEventMs = ms
          }
          state.update(NodSt(minTs, st.emitted))
          if (!st.emitted && maxEventMs > Long.MinValue)
            state.setTimeoutTimestamp(math.max(
              maxEventMs + idleSeconds * 1000L,
              state.getCurrentWatermarkMs() + 1000L))
          Iterator.empty
      }.toDF()
  }
}
