package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming DGA-candidate detector — the continuous form of the batch
  * `pcap_dga_candidates` rollup: alert a CLIENT once its accumulated
  * lookup behavior crosses BOTH the NXDOMAIN-rate and the name-shape
  * thresholds (either alone false-positives; see the batch op's doc).
  *
  * Same state discipline as [[NodStream]]: the thresholds are claims
  * about a client's whole (watermark-admitted) history, so nothing
  * alerts on arrival — per-client counters fold in every observation
  * and the verdict is taken at event-time quiescence
  * (`EventTimeTimeout` after `idleSeconds` of event-time silence), by
  * which point the counters equal the batch twin's row BY
  * CONSTRUCTION, in any file-admission order. A flagged client emits
  * once and tombstones (no re-alert on a later burst); an unflagged
  * client KEEPS its counters (no timeout-reset — a slow walker that
  * quiesces twice still accumulates toward the threshold, exactly as
  * the batch sweep would see it).
  *
  * Scale shape: one shuffle on the client key; state is O(clients) ×
  * 6 longs — counters only, never names or packets (the per-name
  * shape stats are folded into the two running sums per row, so a
  * million-name walker costs the same 48 bytes as a quiet host).
  * Append-mode alert rows.
  */
object DgaStream {

  final case class DgaIn(client: String, isQ: Boolean, nx: Boolean,
      sldLen: Long, sldDigits: Long, time: java.sql.Timestamp)

  /** Per-client counters; `emitted` tombstones after the alert. */
  final case class DgaSt(nQ: Long, nR: Long, nNx: Long, sumLen: Long,
      sumDig: Long, emitted: Boolean)

  final case class DgaOut(client: String, n_queries: Long,
      n_responses: Long, n_nxdomain: Long, sum_sld_len: Long,
      sum_sld_digits: Long)

  /** The batch rule, verbatim (integer arithmetic, no float ratios). */
  private def flagged(st: DgaSt, minQueries: Long): Boolean =
    st.nQ >= minQueries && st.nNx * 10 >= st.nR * 6 &&
      st.sumDig * 100 >= st.sumLen * 15

  /** `packets`: streaming DataFrame with the pcap source's schema
    * (decoder=dns). One append-mode row per client that crosses both
    * thresholds, at event-time quiescence. */
  def alerts(packets: DataFrame, watermark: String = "30 seconds",
      idleSeconds: Int = 60, minQueries: Long = 10): DataFrame = {
    val s = packets.sparkSession
    import s.implicits._
    import org.apache.spark.sql.functions._
    packets
      .filter($"protocol" === "UDP" && $"dns_qname".isNotNull &&
        ($"dst_port" === 53 || $"src_port" === 53))
      .withColumn("isQ", $"dst_port" === 53)
      .withColumn("sld", substring_index($"dns_qname", ".", 1))
      .select(
        when($"isQ", $"src").otherwise($"dst").as("client"),
        $"isQ",
        coalesce($"dns_rcode" === "NXDOMAIN", lit(false)).as("nx"),
        when($"isQ", length($"sld").cast("long")).otherwise(0L)
          .as("sldLen"),
        when($"isQ", (length($"sld") -
          length(regexp_replace($"sld", "[0-9]", ""))).cast("long"))
          .otherwise(0L).as("sldDigits"),
        $"time")
      .withWatermark("time", watermark)
      .as[DgaIn]
      .groupByKey(_.client)
      .flatMapGroupsWithState[DgaSt, DgaOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (client, _, state) if state.hasTimedOut =>
          val st = state.get
          if (!st.emitted && flagged(st, minQueries)) {
            // tombstone: counters stay (cheap) but never emit again
            state.update(st.copy(emitted = true))
            Iterator.single(DgaOut(client, st.nQ, st.nR, st.nNx,
              st.sumLen, st.sumDig))
          } else Iterator.empty
          // unflagged: counters survive the quiescence — a later burst
          // re-arms the timeout in the data branch and keeps counting
        case (_, rows, state: GroupState[DgaSt]) =>
          var st = state.getOption.getOrElse(
            DgaSt(0L, 0L, 0L, 0L, 0L, emitted = false))
          var maxEventMs = Long.MinValue
          rows.foreach { x =>
            if (x.isQ)
              st = st.copy(nQ = st.nQ + 1, sumLen = st.sumLen + x.sldLen,
                sumDig = st.sumDig + x.sldDigits)
            else
              st = st.copy(nR = st.nR + 1,
                nNx = st.nNx + (if (x.nx) 1 else 0))
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
