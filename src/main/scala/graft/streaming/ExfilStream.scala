package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exfiltration detector — the continuous form of the batch
  * `pcap_exfil_candidates` sweep: per (internal host, external
  * destination), payload bytes out vs in, alerting once the flow's
  * accumulated history is upload-heavy (bytes_out ≥ 5 × bytes_in AND
  * ≥ `minBytes`) at event-time quiescence.
  *
  * Same state discipline as [[DgaStream]]: the asymmetry rule is a
  * claim about the flow's WHOLE history (an upload burst followed by a
  * big download is backup traffic, not exfil — alerting mid-flow would
  * false-positive), so counters fold every packet and the verdict
  * waits for `idleSeconds` of event-time silence. Counters are
  * commutative sums — arrival-order independent BY CONSTRUCTION. A
  * flagged flow emits once and tombstones.
  *
  * The sanctioned-destination allowlist is applied BEFORE state:
  * packets to allowlisted destinations never allocate a key at all —
  * strictly cheaper than the batch form's post-rollup join, with the
  * same alert set (an allowlisted flow can never alert either way).
  * State is O(active unsanctioned flows) × three longs.
  */
object ExfilStream {

  final case class ExIn(ext: String, host: String, bOut: Long,
      bIn: Long, time: java.sql.Timestamp)

  final case class ExSt(bytesOut: Long, bytesIn: Long, nPkts: Long,
      emitted: Boolean)

  final case class ExOut(ext: String, host: String, bytes_out: Long,
      bytes_in: Long, n_pkts: Long)

  /** The batch rule, verbatim (integer arithmetic). */
  private def flagged(st: ExSt, minBytes: Long): Boolean =
    st.bytesOut >= 5 * st.bytesIn && st.bytesOut >= minBytes

  /** `packets`: streaming DataFrame with the pcap source's schema. One
    * append-mode alert row per unsanctioned upload-heavy flow, at
    * event-time quiescence. */
  def alerts(packets: DataFrame,
      allowlist: Set[String] = Set("192.0.2.10", "192.0.2.11"),
      watermark: String = "30 seconds", idleSeconds: Int = 60,
      minBytes: Long = 10000L): DataFrame = {
    val s = packets.sparkSession
    import s.implicits._
    import org.apache.spark.sql.functions._
    packets
      .filter($"protocol" === "UDP" && $"len" > 0)
      .withColumn("up", $"src".startsWith("10."))
      .select(
        when($"up", $"dst").otherwise($"src").as("ext"),
        when($"up", $"src").otherwise($"dst").as("host"),
        when($"up", $"len").otherwise(0).cast("long").as("bOut"),
        when(!$"up", $"len").otherwise(0).cast("long").as("bIn"),
        $"time")
      .filter(!$"ext".isInCollection(allowlist))
      .withWatermark("time", watermark)
      .as[ExIn]
      .groupByKey(x => (x.ext, x.host))
      .flatMapGroupsWithState[ExSt, ExOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((ext, host), _, state) if state.hasTimedOut =>
          val st = state.get
          if (!st.emitted && flagged(st, minBytes)) {
            state.update(st.copy(emitted = true))
            Iterator.single(
              ExOut(ext, host, st.bytesOut, st.bytesIn, st.nPkts))
          } else Iterator.empty
        case (_, rows, state: GroupState[ExSt]) =>
          var st = state.getOption.getOrElse(
            ExSt(0L, 0L, 0L, emitted = false))
          var maxEventMs = Long.MinValue
          rows.foreach { x =>
            st = st.copy(bytesOut = st.bytesOut + x.bOut,
              bytesIn = st.bytesIn + x.bIn, nPkts = st.nPkts + 1)
            val ms = x.time.getTime
            if (ms > maxEventMs) maxEventMs = ms
          }
          state.update(st)
          if (!st.emitted && maxEventMs > Long.MinValue)
            state.setTimeoutTimestamp(math.max(
              maxEventMs + idleSeconds * 1000L,
              state.getCurrentWatermarkMs() + 1000L))
          Iterator.empty
      }.toDF()
  }
}
