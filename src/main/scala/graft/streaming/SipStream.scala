package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SIP session monitor — the continuous form of the batch
  * `pcap_sip_sessions` rollup: signaling packets LAND, and one call
  * detail row (caller/callee, final INVITE status, post-dial delay,
  * BYE-derived duration) emits per Call-ID at event-time quiescence —
  * the CDR generator a VoIP estate runs against live capture instead
  * of waiting for closed files.
  *
  * Every state field is a conditional MIN/MAX/COUNT of per-message
  * values (the batch twin's aggregate shape verbatim), so the fold is
  * commutative and arrival order is irrelevant BY CONSTRUCTION — a BYE
  * arriving a micro-batch before its INVITE folds to the identical
  * state. [[graft.pcap.Decap.sip]] is the ONLY parser on both paths. */
object SipStream {

  final case class SpIn(payload: Array[Byte], tsUs: Long,
      time: java.sql.Timestamp)

  /** Conditional-extrema state; Long.MaxValue marks "not seen yet" for
    * the MINs and -1 for the MAXes, exactly the neutral elements the
    * batch aggregates start from. */
  final case class SpSt(caller: String, callee: String, nMsgs: Long,
      status: Int, inviteUs: Long, answerUs: Long, byeUs: Long)

  final case class SpOut(call_id: String, caller: String, callee: String,
      n_msgs: Long, status_code: Int, setup_us: Long,
      duration_us: Option[Long])

  def reports(packets: DataFrame, sipPort: Int = 5060,
      watermark: String = "30 seconds", idleSeconds: Int = 60)
      : DataFrame = {
    val s = packets.sparkSession
    import s.implicits._
    import org.apache.spark.sql.functions._
    packets
      .filter($"protocol" === "UDP" && $"dst_port" === sipPort &&
        $"payload".isNotNull)
      .select($"payload", $"ts_micro".as("tsUs"), $"time")
      .withWatermark("time", watermark)
      .as[SpIn]
      // non-SIP payloads key to "": no state, watermark still advances
      .groupByKey(x => graft.pcap.Decap.sip(x.payload)
        .map(_.callId).getOrElse(""))
      .flatMapGroupsWithState[SpSt, SpOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (callId, _, state) if state.hasTimedOut =>
          val st = state.get
          state.remove()
          if (st.inviteUs == Long.MaxValue || st.answerUs < 0)
            Iterator.empty // never saw the INVITE leg — not a call
          else Iterator.single(SpOut(callId, st.caller, st.callee,
            st.nMsgs, st.status, st.answerUs - st.inviteUs,
            if (st.byeUs == Long.MaxValue) None
            else Some(st.byeUs - st.inviteUs)))
        case (callId, rows, state: GroupState[SpSt]) =>
          if (callId.isEmpty) Iterator.empty
          else {
            var maxEventMs = Long.MinValue
            // "￿" is the MIN-fold neutral for the ASCII URIs
            var st = state.getOption.getOrElse(
              SpSt("￿", "￿", 0L, -1, Long.MaxValue, -1L,
                Long.MaxValue))
            rows.foreach { x =>
              val ms = x.time.getTime
              if (ms > maxEventMs) maxEventMs = ms
              graft.pcap.Decap.sip(x.payload).foreach { m =>
                st = SpSt(
                  if (m.fromUri < st.caller) m.fromUri else st.caller,
                  if (m.toUri < st.callee) m.toUri else st.callee,
                  st.nMsgs + 1,
                  if (m.method == "INVITE" && m.status > 0)
                    math.max(st.status, m.status) else st.status,
                  if (m.method == "INVITE" && m.status == 0)
                    math.min(st.inviteUs, x.tsUs) else st.inviteUs,
                  if (m.method == "INVITE" && m.status > 0)
                    math.max(st.answerUs, x.tsUs) else st.answerUs,
                  if (m.method == "BYE" && m.status == 0)
                    math.min(st.byeUs, x.tsUs) else st.byeUs)
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
