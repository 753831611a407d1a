package graft.sources.pcap

import org.apache.spark.sql.sources._

import graft.pcap.PacketRecord

/** Compiles the subset of Spark `Filter`s the decoder can evaluate per
  * packet (port/protocol/ether_type/src/dst equality and IN; ts range;
  * dns_qname/dns_rcode equality, prefix, suffix, contains; dns_qr
  * equality) into one predicate over [[PacketRecord]]. A packet failing a
  * pushed filter is skipped before row materialization — Spark still
  * applies the full filter post-scan, so pushdown is purely a
  * row-skipping optimization (a qname-suffix scan over a 100 TB archive
  * decodes every packet but materializes only the matching rows, and
  * RR-section string building is skipped for everything else).
  */
object PcapPacketFilter {
  type Predicate = PacketRecord => Boolean
  val acceptAll: Predicate = _ => true

  private val columns = Set("src_port", "dst_port", "protocol",
    "ether_type", "ts", "src", "dst", "tcp_flags",
    "dns_qname", "dns_rcode", "dns_qr")
  // tcp_flags is here for the TcpFlag membership predicates
  // (contains("SYN") etc.) — the SYN-scan/handshake queries' row-skip
  private val stringColumns = Set("dns_qname", "dns_rcode", "tcp_flags")

  def supported(f: Filter): Boolean = f match {
    case EqualTo(c, _) => columns(c)
    case In(c, _) => columns(c)
    case GreaterThan("ts", _) | GreaterThanOrEqual("ts", _) |
         LessThan("ts", _) | LessThanOrEqual("ts", _) => true
    case StringStartsWith(c, _) => stringColumns(c)
    case StringEndsWith(c, _) => stringColumns(c)
    case StringContains(c, _) => stringColumns(c)
    // Catalyst attaches IsNotNull beneath most comparison filters, and
    // "dns_qname IS NOT NULL" is the canonical DNS-telemetry predicate:
    // skipping row materialization for the non-matching packets (ARP,
    // non-DNS UDP) is a large fraction of a mixed capture
    case IsNotNull(c) => columns(c)
    case _ => false
  }

  private def field(c: String, r: PacketRecord): Option[Any] = c match {
    case "src_port" => r.srcPort
    case "dst_port" => r.dstPort
    case "protocol" => r.protocol
    case "ether_type" => r.etherType
    case "ts" => r.ts
    case "src" => r.src
    case "dst" => r.dst
    case "tcp_flags" => r.tcpFlags
    case "dns_qname" => r.dns.flatMap(_.qname)
    case "dns_rcode" => r.dns.map(_.rcode)
    case "dns_qr" => r.dns.map(_.qr)
    case _ => None
  }

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case _ => Long.MinValue
  }

  /** numeric-tolerant equality (Spark may hand us Int or Long literals) */
  private def same(x: Any, v: Any): Boolean = (x, v) match {
    case (a: Int, b) => asLong(a) == asLong(b)
    case (a: Long, b) => a == asLong(b)
    case (a, b) => a == b
  }

  private def one(f: Filter): Predicate = f match {
    // a record missing the column is NULL → the filter can't match;
    // skipping is safe (Spark's residual filter would drop it anyway)
    case IsNotNull(c) =>
      r => field(c, r).isDefined
    case EqualTo(c, v) =>
      r => field(c, r).exists(same(_, v))
    case In(c, vs) =>
      r => field(c, r).exists(x => vs.exists(same(x, _)))
    case GreaterThan("ts", v) => r => r.ts.exists(_ > asLong(v))
    case GreaterThanOrEqual("ts", v) => r => r.ts.exists(_ >= asLong(v))
    case LessThan("ts", v) => r => r.ts.exists(_ < asLong(v))
    case LessThanOrEqual("ts", v) => r => r.ts.exists(_ <= asLong(v))
    case StringStartsWith(c, p) =>
      r => field(c, r).exists { case s: String => s.startsWith(p); case _ => false }
    case StringEndsWith(c, p) =>
      r => field(c, r).exists { case s: String => s.endsWith(p); case _ => false }
    case StringContains(c, p) =>
      r => field(c, r).exists { case s: String => s.contains(p); case _ => false }
    case _ => acceptAll
  }

  def compile(filters: Array[Filter]): Predicate =
    if (filters.isEmpty) acceptAll
    else {
      val ps = filters.map(one)
      r => ps.forall(_(r))
    }
}
