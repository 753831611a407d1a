package graft.operators

/** Constant-table oracle for `pcap_dns_latency` over the deterministic
  * conversation capture ([[graft.pcap.PcapSynth.qrConversations]], n =
  * 20000). Values derived independently by `tools/gen_pcap_oracles.py`
  * (struct-level Python re-decode + re-pairing of the capture bytes) and
  * re-checked every round by `tools/pcap_oracle.py`.
  */
object LatencyOracle {
  val sql: String =
    """SELECT CAST(v.rcode AS VARCHAR) AS rcode, CAST(v.n AS BIGINT) AS n,
      CAST(v.min_us AS BIGINT) AS min_us, CAST(v.max_us AS BIGINT) AS max_us,
      CAST(v.sum_us AS BIGINT) AS sum_us
      FROM (VALUES
        ('NOERROR', 16240, 229, 150198, 1205824964),
        ('NXDOMAIN', 2707, 303, 150161, 201218202),
        ('UNANSWERED', 1053, NULL, NULL, NULL))
      AS v(rcode, n, min_us, max_us, sum_us)
      ORDER BY rcode"""
}
