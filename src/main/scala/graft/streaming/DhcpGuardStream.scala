package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming rogue-DHCP detector — the continuous form of the batch
  * `pcap_dhcp_rogue_twin` query, completing the detector family
  * (SYN-scan, DNS-tunnel, now DHCP): more than one distinct server
  * identity OFFERing leases inside a window is the classic
  * rogue-DHCP-on-the-segment alert, emitted once the watermark closes
  * the window (append mode — safe to sink to an alert pipeline).
  *
  * Shape: port filter (pushable into the pcap decoder) → stateless
  * per-row RFC 2131/2132 parse ([[graft.pcap.Decap.dhcp]], OFFERs
  * only) → watermark → bounded per-window server dedup
  * (`dropDuplicatesWithinWatermark`, so a chatty server cannot grow
  * state) → tumbling-window distinct-server count → threshold. The
  * same two-exchange watermark-windowed-agg shape as
  * [[SynScanStream]].
  */
object DhcpGuardStream {

  /** `packets`: streaming DataFrame with `time`, `protocol`,
    * `src_port`, `payload`. One row per window whose distinct
    * OFFERing-server count reaches `minServers`, after close. */
  def rogueAlerts(packets: DataFrame, watermark: String = "30 seconds",
      window: String = "2 seconds", minServers: Int = 2): DataFrame = {
    val s = packets.sparkSession
    import s.implicits._
    packets
      .filter(col("protocol") === "UDP" && col("src_port") === 67 &&
        col("payload").isNotNull)
      .select(col("time"), col("payload"))
      .as[(java.sql.Timestamp, Array[Byte])]
      .mapPartitions(_.flatMap { case (t, pl) =>
        graft.pcap.Decap.dhcp(pl).collect {
          case f if f.op == 2 && f.msgType == 2 && f.serverId.isDefined =>
            (t, f.serverId.get)
        }
      })
      .toDF("time", "server_id")
      .withWatermark("time", watermark)
      .withColumn("w",
        org.apache.spark.sql.functions.window(col("time"), window))
      // the window struct inherits the event-time watermark (the
      // SynScanStream rule: the raw time column must go)
      .drop("time")
      .dropDuplicatesWithinWatermark("w", "server_id")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_servers"),
        min(col("server_id")).as("srv_a"),
        max(col("server_id")).as("srv_b"))
      .filter(col("n_servers") >= minServers)
      .select(unix_timestamp(col("w.start")).as("window_start_s"),
        col("n_servers"), col("srv_a"), col("srv_b"))
  }
}
