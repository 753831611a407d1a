package graft.operators

/** Constant-table oracle for pcap_dns_tunnel_signals, derived
  * INDEPENDENTLY by tools/gen_pcap_oracles.py (plain-Python struct-level
  * re-decode of the deterministic synth capture; selection — sort by
  * (uniq_rate desc, sld asc), top 20 — replicated with IEEE doubles). */
private[operators] object TunnelSignalsOracle {
  val sql: String = """SELECT CAST(v.sld AS VARCHAR) AS sld,
        CAST(v.n_queries AS BIGINT) AS n_queries,
        CAST(v.n_unique AS BIGINT) AS n_unique,
        CAST(v.total_len AS BIGINT) AS total_len,
        CAST(v.max_len AS INT) AS max_len,
        CAST(v.uniq_rate AS DOUBLE) AS uniq_rate
        FROM (VALUES ('example14.com.', 4995, 1500, 119216, 24, 0.3003003003003003),
        ('example15.com.', 4995, 1500, 119216, 24, 0.3003003003003003),
        ('example22.com.', 4995, 1500, 119216, 24, 0.3003003003003003),
        ('example23.com.', 4995, 1500, 119216, 24, 0.3003003003003003),
        ('example30.com.', 4995, 1500, 119216, 24, 0.3003003003003003),
        ('example31.com.', 4995, 1500, 119216, 24, 0.3003003003003003),
        ('example38.com.', 4995, 1500, 119216, 24, 0.3003003003003003),
        ('example39.com.', 4995, 1500, 119216, 24, 0.3003003003003003),
        ('example46.com.', 4995, 1500, 119216, 24, 0.3003003003003003),
        ('example47.com.', 4995, 1500, 119216, 24, 0.3003003003003003),
        ('example48.com.', 4995, 1500, 119212, 24, 0.3003003003003003),
        ('example49.com.', 4995, 1500, 119212, 24, 0.3003003003003003),
        ('example6.com.', 4995, 1500, 114221, 23, 0.3003003003003003),
        ('example7.com.', 4995, 1500, 114221, 23, 0.3003003003003003),
        ('example0.com.', 4996, 1500, 114236, 23, 0.300240192153723),
        ('example1.com.', 4996, 1500, 114236, 23, 0.300240192153723),
        ('example10.com.', 4996, 1500, 119236, 24, 0.300240192153723),
        ('example11.com.', 4996, 1500, 119236, 24, 0.300240192153723),
        ('example12.com.', 4996, 1500, 119240, 24, 0.300240192153723),
        ('example13.com.', 4996, 1500, 119240, 24, 0.300240192153723))
        AS v(sld, n_queries, n_unique, total_len, max_len, uniq_rate)"""
}
