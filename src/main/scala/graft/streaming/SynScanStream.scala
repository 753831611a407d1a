package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming SYN port-scan detector over the `tcp_flags` column — the
  * continuous form of the batch `pcap_syn_portscan_twin` query: a
  * source probing many distinct destination ports within a window is
  * alerted once the watermark closes the window (append mode — safe to
  * sink to an alert pipeline).
  *
  * Shape: flag filter (pushable into the pcap decoder on the batch
  * side) -> watermark -> bounded dedup of (src, dst_port) within the
  * watermark horizon (`dropDuplicatesWithinWatermark`, so the
  * distinct-port count is exact under bounded state — an address
  * spraying random ports cannot grow state past the horizon) ->
  * tumbling-window count per src -> threshold. Same two-exchange
  * watermark-windowed-agg shape as [[DnsTunnelStream]].
  *
  * Scale: state is (src, dst_port-digest) for the dedup plus
  * (window, src) running counts, both watermark-bounded; the
  * aggregation shuffles on (window, src) with map-side partials.
  */
object SynScanStream {

  /** `packets`: streaming DataFrame with `time` (timestamp), `tcp_flags`,
    * `src`, `dst_port`. Emits one row per (window, src) whose distinct
    * probed-port count reaches `minPorts`, after the window closes. */
  def scanAlerts(packets: DataFrame, watermark: String = "30 seconds",
      window: String = "10 seconds", minPorts: Int = 3): DataFrame =
    packets
      // flag-membership match (graft.pcap.TcpFlag): an ECN SYN renders
      // as "SYN|ECE|CWR" and exact equality would miss the scan entirely
      .filter(graft.pcap.TcpFlag.synNoAck(col("tcp_flags")))
      .select(col("time"), col("src"), col("dst_port"))
      .withWatermark("time", watermark)
      // exact distinct under bounded state; the dedup key includes the
      // window bucket so a scanner re-probing the SAME ports in a LATER
      // window still alerts there (matching the batch twin's per-window
      // countDistinct semantics — dedup on (src, port) alone would
      // swallow the repeat within the watermark horizon)
      .withColumn("w",
        org.apache.spark.sql.functions.window(col("time"), window))
      // the window struct inherits the event-time watermark; the raw
      // time column must go or the plan carries two event-time columns
      .drop("time")
      .dropDuplicatesWithinWatermark("w", "src", "dst_port")
      .groupBy(col("w"), col("src"))
      .agg(count(lit(1)).as("n_ports"))
      .filter(col("n_ports") >= minPorts)
      .select(unix_timestamp(col("w.start")).as("window_start_s"),
        col("src").as("scanner"), col("n_ports"))
}
