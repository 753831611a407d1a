package graft.pcap

import org.apache.spark.sql.Column

/** Flag-membership predicates over the rendered `tcp_flags` mnemonic.
  *
  * Exact string equality (`=== "SYN"`, `isin("SYN","SYN|ACK")`) silently
  * misses ECN-negotiating handshakes: on real captures an ECN SYN renders
  * as "SYN|ECE|CWR" and its SYN|ACK as "SYN|ACK|ECE" (RFC 3168 §6.1.1),
  * so equality-matched detectors drop exactly the flows a modern stack
  * negotiates. These predicates test bit membership instead.
  *
  * `contains` is token-exact here: no flag name is a substring of any
  * other ("FIN","SYN","RST","PSH","ACK","URG","ECE","CWR","NS") and the
  * rendering joins with '|', so "SYN" occurs in the rendered string iff
  * the SYN bit is set.
  */
object TcpFlag {
  def hasSyn(c: Column): Column = c.contains("SYN")
  def hasAck(c: Column): Column = c.contains("ACK")
  def hasPsh(c: Column): Column = c.contains("PSH")
  def hasFin(c: Column): Column = c.contains("FIN")
  def hasRst(c: Column): Column = c.contains("RST")

  /** SYN set, ACK clear — a connection-initiating segment (incl. ECN). */
  def synNoAck(c: Column): Column = hasSyn(c) && !hasAck(c)

  /** SYN and ACK both set — the handshake reply (incl. ECN). */
  def synAck(c: Column): Column = hasSyn(c) && hasAck(c)
}
