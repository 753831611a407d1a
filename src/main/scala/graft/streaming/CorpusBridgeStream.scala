package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One gated corpus document emitted by the streaming bridge, keyed by
  * the conversation's client endpoint (doc_id derivation happens
  * downstream in [[CorpusBridgeStream.documents]] with the SAME Spark
  * expression the batch bridge uses). */
final case class CorpusDocOut(client: String, client_port: Int,
    host: String, n_tokens: Long, body_md5: String)

/** Streaming pcap→LLM-corpus bridge — the continuous form of the batch
  * `pcap_http_to_corpus` query (round-9 verdict #5): captures LAND, and
  * gated documents stream out as their conversations quiesce, instead
  * of waiting for a closed capture to re-scan.
  *
  * Composition: the same direction-normalized conversation key as the
  * batch bridge, but the per-direction reassembly and the document cut
  * run in ONE `flatMapGroupsWithState` stage — state per conversation
  * is the two in-order stream prefixes (request + response bytes,
  * frontier-trimmed first-copy-wins exactly like
  * [[TcpStreamFollower]] / the batch `ReassembleAgg`), bounded by
  * `maxBytesPerDirection`; a conversation that hits the cap is POISONED
  * and emits nothing (a truncated body would de-frame to a corrupt
  * document — the batch bridge's `truncated` flag equivalent).
  *
  * A document EMITS when its conversation has been idle past
  * `idleSeconds` of event time (the watermark-driven
  * `EventTimeTimeout`): streams carry no in-band "response complete"
  * marker the follower tracks, so quiescence IS the close signal —
  * the same contract as the follower's idle eviction. At emission the
  * response stream is de-framed (`HttpParse.deframe`: Content-Length
  * cut / chunked / gzip), status-gated to 2xx, and the batch bridge's
  * quality gate replays byte-for-byte (split(" ", -1) tokens ≥ 20,
  * integer distinct-ratio ≥ 0.3, the DuckDB oracle's exact
  * arithmetic), with the body's lowercase-hex md5 as the dedup key
  * downstream consumers group on.
  *
  * Scale shape: one shuffle on the conversation key; state is O(active
  * conversations) × the direction cap, evicted on emission; output is
  * append-mode document rows — no unbounded operator anywhere.
  * Exactly-once across restarts comes from the checkpointed state
  * store (spec-verified in the StreamCompaction style).
  */
object CorpusBridgeStream {

  final case class SegIn(server: String, client: String,
      client_port: Int, is_req: Boolean, tcp_seq: Long, pkt_idx: Long,
      payload: Array[Byte], time: java.sql.Timestamp)

  /** Per-conversation state: the two direction prefixes and their
    * coverage frontiers (Long.MinValue until the first segment);
    * `poisoned` marks a direction that overflowed the cap. */
  final case class ConvSt(reqNext: Long, req: Array[Byte],
      rspNext: Long, rsp: Array[Byte], poisoned: Boolean)

  /** `packets`: streaming DataFrame with the pcap source's schema
    * (`time`, `protocol`, `src`/`dst`, ports, `tcp_seq`, `pkt_idx`,
    * `payload`). Emits append-mode (doc_id, host, n_tokens, body_md5)
    * rows — the batch bridge's gated pre-dedup relation. `docIdBase`
    * has the batch bridge's semantics: ≥ 0 derives doc_id as
    * `client_port - docIdBase`, < 0 hashes the client endpoint. */
  def documents(packets: DataFrame, serverPort: Int = 80,
      docIdBase: Int = -1, watermark: String = "30 seconds",
      idleSeconds: Int = 60,
      maxBytesPerDirection: Long =
        graft.functions.Reassemble.DefaultMaxStreamBytes): DataFrame = {
    val s = packets.sparkSession
    import s.implicits._
    val segs = packets
      .filter($"protocol" === "TCP" && $"tcp_seq".isNotNull &&
        $"payload".isNotNull)
      .select(
        when($"dst_port" === serverPort, $"dst").otherwise($"src")
          .as("server"),
        when($"dst_port" === serverPort, $"src").otherwise($"dst")
          .as("client"),
        when($"dst_port" === serverPort, $"src_port")
          .otherwise($"dst_port").cast("int").as("client_port"),
        ($"dst_port" === serverPort).as("is_req"),
        $"tcp_seq", $"pkt_idx", $"payload", $"time")
      .withWatermark("time", watermark)
      .as[SegIn]
    val docs = segs
      .groupByKey(x => (x.server, x.client, x.client_port))
      .flatMapGroupsWithState[ConvSt, CorpusDocOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((_, client, cport), _, state) if state.hasTimedOut =>
          val st = state.get
          state.remove()
          finish(client, cport, st)
        case ((_, client, cport), rows, state: GroupState[ConvSt]) =>
          var st = state.getOption.getOrElse(ConvSt(
            Long.MinValue, Array.emptyByteArray,
            Long.MinValue, Array.emptyByteArray, poisoned = false))
          val arr = rows.toArray
          var maxEventMs = Long.MinValue
          arr.foreach { x =>
            val ms = x.time.getTime
            if (ms > maxEventMs) maxEventMs = ms
          }
          // each direction folds independently in (tcp_seq, pkt_idx)
          // order against its frontier — the follower's exact sweep
          for (isReq <- Seq(true, false)) {
            val dir = arr.filter(_.is_req == isReq)
              .sortInPlaceWith { (a, b) =>
                a.tcp_seq < b.tcp_seq ||
                  (a.tcp_seq == b.tcp_seq && a.pkt_idx < b.pkt_idx)
              }
            if (dir.nonEmpty && !st.poisoned) {
              var next = if (isReq) st.reqNext else st.rspNext
              val buf = new java.io.ByteArrayOutputStream()
              buf.write(if (isReq) st.req else st.rsp)
              dir.foreach { x =>
                val effEnd = x.tcp_seq + x.payload.length
                if (!st.poisoned && effEnd > next) {
                  val trim =
                    if (next == Long.MinValue || x.tcp_seq >= next) 0
                    else (next - x.tcp_seq).toInt
                  val len = x.payload.length - trim
                  if (buf.size() + len > maxBytesPerDirection)
                    st = st.copy(poisoned = true)
                  else {
                    buf.write(x.payload, trim, len)
                    next = effEnd
                  }
                }
              }
              st =
                if (isReq) st.copy(reqNext = next, req = buf.toByteArray)
                else st.copy(rspNext = next, rsp = buf.toByteArray)
            }
          }
          state.update(st)
          // clamped to the watermark: a straggler batch whose events
          // are already below the watermark (e.g. files admitted out of
          // event-time order around a restart) must still set a LEGAL
          // timeout — its conversation then closes at the next horizon
          // instead of crashing the query
          if (maxEventMs > Long.MinValue)
            state.setTimeoutTimestamp(math.max(
              maxEventMs + idleSeconds * 1000L,
              state.getCurrentWatermarkMs() + 1000L))
          Iterator.empty
      }.toDF()
    val docId =
      if (docIdBase >= 0) ($"client_port" - docIdBase).cast("long")
      else xxhash64($"client", $"client_port")
    docs.select(docId.as("doc_id"), $"host", $"n_tokens", $"body_md5")
  }

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Conversation close: de-frame, status-gate, quality-gate, digest —
    * the batch bridge's exact arithmetic (and the DuckDB oracle's). */
  private def finish(client: String, clientPort: Int,
      st: ConvSt): Iterator[CorpusDocOut] = {
    if (st.poisoned || st.reqNext == Long.MinValue ||
      st.rspNext == Long.MinValue) return Iterator.empty
    val rsp = graft.functions.HttpParse.deframe(st.rsp)
    if (rsp == null) return Iterator.empty
    val status = rsp.getInt(0)
    if (status < 200 || status >= 300) return Iterator.empty
    val text = new String(rsp.getBinary(1), Utf8)
    val w = text.split(" ", -1)
    if (w.length < 20) return Iterator.empty
    if (w.distinct.length.toLong * 1000000L / w.length < 300000L)
      return Iterator.empty
    val host = graft.functions.HttpParse
      .requestHeader(new String(st.req, Utf8), "Host").getOrElse("")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(Utf8)).map(b => f"${b & 0xFF}%02x").mkString
    Iterator.single(
      CorpusDocOut(client, clientPort, host, w.length.toLong, md5))
  }
}
