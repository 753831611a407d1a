package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming DNS-tunneling detector — the reference stack's driving use
  * case (DNS research over captures) moved onto the incremental engine:
  * the same per-SLD unique-subdomain-rate signals as the batch
  * `pcap_dns_tunnel_signals` query, computed continuously over a query
  * stream (e.g. `readStream.format("pcap")` on a landing directory,
  * selecting `time` + `dns_qname`).
  *
  * Shape: watermark -> bounded dedup of (sld, qname) within the
  * watermark horizon (`dropDuplicatesWithinWatermark` — state per key
  * expires, so an unbounded qname space cannot grow state forever) ->
  * tumbling-window count of unique names per SLD. A benign SLD
  * resolves few distinct names per window; an exfiltration/tunnel
  * domain mints a new subdomain per payload chunk, so its unique count
  * tracks its query count. Output is append-mode (finalized windows
  * only) — safe to sink to a file/alert pipeline.
  *
  * Scale: state is (window, sld, qname-digest) for the dedup plus
  * (window, sld) running counts; both bounded by the watermark. The
  * aggregation shuffles on (window, sld) with map-side partial counts —
  * the same two-exchange shape as any streaming windowed agg.
  */
object DnsTunnelStream {

  /** `queries`: streaming DataFrame with `time` (timestamp) and
    * `dns_qname` (string). Emits one row per (window, sld) with the
    * unique-subdomain count once the watermark closes the window. */
  def uniqueNamesPerSld(queries: DataFrame, watermark: String = "10 minutes",
      window: String = "5 minutes"): DataFrame =
    queries
      .filter(col("dns_qname").isNotNull)
      // DNS names are case-insensitive and the parser preserves case
      // (0x20-mixing resolvers would otherwise split one tunnel domain
      // across many groups) -> lowercase before grouping. The label
      // charset admits digits in the TLD and underscores (common in
      // service records); names that still don't yield an SLD (bare
      // hosts, the root) are dropped rather than pooled under "".
      .select(col("time"),
        regexp_extract(lower(col("dns_qname")),
          "([a-z0-9_-]+\\.[a-z0-9-]+\\.)$", 1).as("sld"),
        lower(col("dns_qname")).as("dns_qname"))
      .filter(col("sld") =!= "")
      .withWatermark("time", watermark)
      // exact distinct under bounded state: duplicates of (sld, qname)
      // within the horizon collapse before the count
      .dropDuplicatesWithinWatermark("sld", "dns_qname")
      .groupBy(org.apache.spark.sql.functions.window(col("time"), window),
        col("sld"))
      .agg(count(lit(1)).as("n_unique_names"),
        max(length(col("dns_qname"))).as("max_len"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("sld"), col("n_unique_names"), col("max_len"))
}
