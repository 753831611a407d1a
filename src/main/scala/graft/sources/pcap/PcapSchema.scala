package graft.sources.pcap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.pcap.PacketRecord

/** The fixed wide schema of the `pcap` format — the union of every field
  * the reference can emit (packet/Packet.java:9-24, packet/DnsPacket.java:
  * 6-16), every column nullable; a field the decoder didn't populate is
  * NULL, exactly reproducing the Hive SerDe's name-projection semantics
  * (PcapDeserializer.java:54-58). Parity-extension columns (SURVEY.md
  * §1.4): `ts_micro`, `time`, `pkt_idx`, `file`, `payload`.
  */
object PcapSchema {

  val full: StructType = StructType(Seq(
    StructField("ts", LongType),
    StructField("ts_micro", LongType),
    StructField("time", TimestampType),
    StructField("size", LongType),
    StructField("md5", StringType),
    StructField("ether_type", StringType),
    StructField("ttl", IntegerType),
    StructField("protocol", StringType),
    StructField("src", StringType),
    StructField("dst", StringType),
    StructField("src_port", IntegerType),
    StructField("dst_port", IntegerType),
    StructField("udpsum", IntegerType),
    StructField("tcp_seq", LongType),
    StructField("tcp_flags", StringType),
    StructField("tcp_ack", LongType),
    StructField("icmp_type", IntegerType),
    StructField("icmp_code", IntegerType),
    StructField("tcp_window", IntegerType),
    StructField("tcp_mss", IntegerType),
    StructField("tcp_wscale", IntegerType),
    StructField("tcp_sack_ok", BooleanType),
    StructField("tcp_ts_ok", BooleanType),
    StructField("vlan_id", IntegerType),
    StructField("vlan_pcp", IntegerType),
    StructField("vlan_inner_id", IntegerType),
    StructField("mpls_labels", ArrayType(IntegerType)),
    StructField("len", IntegerType),
    StructField("frag", BooleanType),
    StructField("ip_id", IntegerType),
    StructField("frag_offset", IntegerType),
    StructField("payload_len", IntegerType),
    StructField("ext_count", IntegerType),
    StructField("ext_headers", StringType),
    StructField("dns_queryid", IntegerType),
    StructField("dns_flags", StringType),
    StructField("dns_qr", BooleanType),
    StructField("dns_opcode", StringType),
    StructField("dns_rcode", StringType),
    StructField("dns_qname", StringType),
    StructField("dns_qtype", IntegerType),
    StructField("dns_qtype_str", StringType),
    StructField("dns_answer", ArrayType(StringType)),
    StructField("dns_authority", ArrayType(StringType)),
    StructField("dns_additional", ArrayType(StringType)),
    StructField("pkt_idx", LongType),
    StructField("file", StringType),
    StructField("payload", BinaryType),
    StructField("frame", BinaryType)))

  private def utf8(s: String): AnyRef = UTF8String.fromString(s)

  /** Low-cardinality columns (protocol names, flag combos, type mnemonics)
    * repeat millions of times at scale; intern their UTF8String forms.
    * Bounded: only the first 4096 distinct values are cached. */
  private val interned =
    new java.util.concurrent.ConcurrentHashMap[String, UTF8String]()
  private def utf8i(s: String): AnyRef = {
    val cached = interned.get(s)
    if (cached != null) cached
    else {
      val v = UTF8String.fromString(s)
      if (interned.size < 4096) interned.putIfAbsent(s, v)
      v
    }
  }

  private val emptyStrArray: AnyRef = ArrayData.toArrayData(Array.empty[AnyRef])
  private def strArray(xs: Seq[String]): AnyRef =
    if (xs.isEmpty) emptyStrArray
    else ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray)

  /** Per-column extractor: (record, pktIdx, fileName) → Catalyst value. */
  type Extractor = (PacketRecord, Long, UTF8String) => AnyRef

  private val extractors: Map[String, Extractor] = Map(
    "ts" -> ((r, _, _) => r.ts.map(java.lang.Long.valueOf).orNull),
    "ts_micro" -> ((r, _, _) => r.tsMicro.map(java.lang.Long.valueOf).orNull),
    "time" -> ((r, _, _) => r.tsMicro.map(java.lang.Long.valueOf).orNull),
    "size" -> ((r, _, _) => r.size.map(java.lang.Long.valueOf).orNull),
    "md5" -> ((r, _, _) => r.md5.map(utf8).orNull),
    "ether_type" -> ((r, _, _) => r.etherType.map(utf8i).orNull),
    "ttl" -> ((r, _, _) => r.ttl.map(Int.box).orNull),
    "protocol" -> ((r, _, _) => r.protocol.map(utf8i).orNull),
    "src" -> ((r, _, _) => r.src.map(utf8).orNull),
    "dst" -> ((r, _, _) => r.dst.map(utf8).orNull),
    "src_port" -> ((r, _, _) => r.srcPort.map(Int.box).orNull),
    "dst_port" -> ((r, _, _) => r.dstPort.map(Int.box).orNull),
    "udpsum" -> ((r, _, _) => r.udpsum.map(Int.box).orNull),
    "tcp_seq" -> ((r, _, _) => r.tcpSeq.map(java.lang.Long.valueOf).orNull),
    "tcp_flags" -> ((r, _, _) => r.tcpFlags.map(utf8i).orNull),
    "tcp_ack" -> ((r, _, _) => r.tcpAck.map(java.lang.Long.valueOf).orNull),
    "icmp_type" -> ((r, _, _) => r.icmpType.map(Int.box).orNull),
    "icmp_code" -> ((r, _, _) => r.icmpCode.map(Int.box).orNull),
    "tcp_window" -> ((r, _, _) => r.tcpWindow.map(Int.box).orNull),
    "tcp_mss" -> ((r, _, _) => r.tcpMss.map(Int.box).orNull),
    "tcp_wscale" -> ((r, _, _) => r.tcpWscale.map(Int.box).orNull),
    "tcp_sack_ok" -> ((r, _, _) => r.tcpSackOk.map(Boolean.box).orNull),
    "tcp_ts_ok" -> ((r, _, _) => r.tcpTsOk.map(Boolean.box).orNull),
    "vlan_id" -> ((r, _, _) => r.vlanId.map(Int.box).orNull),
    "vlan_pcp" -> ((r, _, _) => r.vlanPcp.map(Int.box).orNull),
    "vlan_inner_id" -> ((r, _, _) => r.vlanInnerId.map(Int.box).orNull),
    "mpls_labels" -> ((r, _, _) =>
      r.mplsLabels.map(xs => ArrayData.toArrayData(xs.toArray)).orNull),
    "len" -> ((r, _, _) => r.len.map(Int.box).orNull),
    "frag" -> ((r, _, _) => r.frag.map(Boolean.box).orNull),
    "ip_id" -> ((r, _, _) => r.ipId.map(Int.box).orNull),
    "frag_offset" -> ((r, _, _) => r.fragOffset.map(Int.box).orNull),
    "payload_len" -> ((r, _, _) => r.payloadLen.map(Int.box).orNull),
    "ext_count" -> ((r, _, _) => r.extCount.map(Int.box).orNull),
    "ext_headers" -> ((r, _, _) => r.extHeaders.map(utf8).orNull),
    "dns_queryid" -> ((r, _, _) => r.dns.map(d => Int.box(d.queryId)).orNull),
    "dns_flags" -> ((r, _, _) => r.dns.map(d => utf8i(d.flags)).orNull),
    "dns_qr" -> ((r, _, _) => r.dns.map(d => Boolean.box(d.qr)).orNull),
    "dns_opcode" -> ((r, _, _) => r.dns.map(d => utf8i(d.opcode)).orNull),
    "dns_rcode" -> ((r, _, _) => r.dns.map(d => utf8i(d.rcode)).orNull),
    "dns_qname" -> ((r, _, _) => r.dns.flatMap(_.qname).map(utf8).orNull),
    "dns_qtype" -> ((r, _, _) => r.dns.map(d => Int.box(d.qtype)).orNull),
    "dns_qtype_str" -> ((r, _, _) => r.dns.flatMap(_.qtypeStr).map(utf8i).orNull),
    "dns_answer" -> ((r, _, _) => r.dns.map(d => strArray(d.answer)).orNull),
    "dns_authority" -> ((r, _, _) => r.dns.map(d => strArray(d.authority)).orNull),
    "dns_additional" -> ((r, _, _) => r.dns.map(d => strArray(d.additional)).orNull),
    "pkt_idx" -> ((_, idx, _) => java.lang.Long.valueOf(idx)),
    "file" -> ((_, _, f) => f),
    "payload" -> ((r, _, _) => r.payload.orNull),
    "frame" -> ((r, _, _) => r.frame.orNull))

  /** Compile the pruned schema into a row writer. */
  def rowBuilder(schema: StructType): (PacketRecord, Long, UTF8String) => InternalRow = {
    val fns = schema.fieldNames.map(extractors)
    (rec, idx, file) => {
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fns.length)
      var i = 0
      while (i < fns.length) {
        row.update(i, fns(i)(rec, idx, file))
        i += 1
      }
      row
    }
  }

  // ----- columnar emission (SURVEY.md §4: vectorized scan) ----------------
  // Per-column appenders writing decoded values straight into
  // WritableColumnVectors — no per-row object, no boxed field array, and
  // downstream operators read the batch through codegen'd ColumnarToRow.
  // The DNS RR-section array columns append through the vector's child
  // (offsets row in the parent, elements in `arrayData()`), so every
  // projection — RR-heavy ones included — takes the columnar path.

  import org.apache.spark.sql.execution.vectorized.WritableColumnVector

  /** Appender: (vector, record, pktIdx, fileNameUtf8Bytes) → appended. */
  type ColAppender = (WritableColumnVector, PacketRecord, Long, Array[Byte]) => Unit

  /** Every pcap column has a columnar appender since the RR-section
    * arrays gained child-vector appends (round-6 verdict #5); the
    * row reader remains only as the golden-parity twin. */
  def columnarEligible(schema: StructType): Boolean = true

  /** Interned UTF-8 byte forms of the low-cardinality strings (same
    * bound and purpose as the UTF8String intern cache above). */
  private val internedBytes =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private def bytesI(s: String): Array[Byte] = {
    val cached = internedBytes.get(s)
    if (cached != null) cached
    else {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (internedBytes.size < 4096) internedBytes.putIfAbsent(s, b)
      b
    }
  }

  @inline private def putLong(v: WritableColumnVector, o: Option[Long]): Unit =
    o match { case Some(x) => v.appendLong(x); case None => v.appendNull() }
  @inline private def putInt(v: WritableColumnVector, o: Option[Int]): Unit =
    o match { case Some(x) => v.appendInt(x); case None => v.appendNull() }
  @inline private def putBool(v: WritableColumnVector, o: Option[Boolean]): Unit =
    o match { case Some(x) => v.appendBoolean(x); case None => v.appendNull() }
  @inline private def putBytes(v: WritableColumnVector, b: Array[Byte]): Unit =
    v.appendByteArray(b, 0, b.length)
  @inline private def putStr(v: WritableColumnVector, o: Option[String]): Unit =
    o match {
      case Some(s) =>
        putBytes(v, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case None => v.appendNull()
    }
  @inline private def putStrI(v: WritableColumnVector, o: Option[String]): Unit =
    o match { case Some(s) => putBytes(v, bytesI(s)); case None => v.appendNull() }

  /** Array-of-string append: the offsets row goes into the parent FIRST
    * (appendArray records the child's CURRENT element count as the start
    * offset), then the elements into the child vector. */
  @inline private def putStrArray(v: WritableColumnVector,
      o: Option[Seq[String]]): Unit = o match {
    case Some(xs) =>
      v.appendArray(xs.length)
      val child = v.arrayData()
      xs.foreach { s =>
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        child.appendByteArray(b, 0, b.length)
      }
    case None => v.appendNull()
  }

  /** Array-of-int append, same offsets-then-elements contract as
    * [[putStrArray]]. */
  @inline private def putIntArray(v: WritableColumnVector,
      o: Option[Seq[Int]]): Unit = o match {
    case Some(xs) =>
      v.appendArray(xs.length)
      val child = v.arrayData()
      xs.foreach(child.appendInt)
    case None => v.appendNull()
  }

  private val colAppenders: Map[String, ColAppender] = Map(
    "ts" -> ((v, r, _, _) => putLong(v, r.ts)),
    "ts_micro" -> ((v, r, _, _) => putLong(v, r.tsMicro)),
    "time" -> ((v, r, _, _) => putLong(v, r.tsMicro)), // TimestampType micros
    "size" -> ((v, r, _, _) => putLong(v, r.size)),
    "md5" -> ((v, r, _, _) => putStr(v, r.md5)),
    "ether_type" -> ((v, r, _, _) => putStrI(v, r.etherType)),
    "ttl" -> ((v, r, _, _) => putInt(v, r.ttl)),
    "protocol" -> ((v, r, _, _) => putStrI(v, r.protocol)),
    "src" -> ((v, r, _, _) => putStr(v, r.src)),
    "dst" -> ((v, r, _, _) => putStr(v, r.dst)),
    "src_port" -> ((v, r, _, _) => putInt(v, r.srcPort)),
    "dst_port" -> ((v, r, _, _) => putInt(v, r.dstPort)),
    "udpsum" -> ((v, r, _, _) => putInt(v, r.udpsum)),
    "tcp_seq" -> ((v, r, _, _) => putLong(v, r.tcpSeq)),
    "tcp_flags" -> ((v, r, _, _) => putStrI(v, r.tcpFlags)),
    "tcp_ack" -> ((v, r, _, _) => putLong(v, r.tcpAck)),
    "icmp_type" -> ((v, r, _, _) => putInt(v, r.icmpType)),
    "icmp_code" -> ((v, r, _, _) => putInt(v, r.icmpCode)),
    "tcp_window" -> ((v, r, _, _) => putInt(v, r.tcpWindow)),
    "tcp_mss" -> ((v, r, _, _) => putInt(v, r.tcpMss)),
    "tcp_wscale" -> ((v, r, _, _) => putInt(v, r.tcpWscale)),
    "tcp_sack_ok" -> ((v, r, _, _) => putBool(v, r.tcpSackOk)),
    "tcp_ts_ok" -> ((v, r, _, _) => putBool(v, r.tcpTsOk)),
    "vlan_id" -> ((v, r, _, _) => putInt(v, r.vlanId)),
    "vlan_pcp" -> ((v, r, _, _) => putInt(v, r.vlanPcp)),
    "vlan_inner_id" -> ((v, r, _, _) => putInt(v, r.vlanInnerId)),
    "mpls_labels" -> ((v, r, _, _) => putIntArray(v, r.mplsLabels)),
    "len" -> ((v, r, _, _) => putInt(v, r.len)),
    "frag" -> ((v, r, _, _) => putBool(v, r.frag)),
    "ip_id" -> ((v, r, _, _) => putInt(v, r.ipId)),
    "frag_offset" -> ((v, r, _, _) => putInt(v, r.fragOffset)),
    "payload_len" -> ((v, r, _, _) => putInt(v, r.payloadLen)),
    "ext_count" -> ((v, r, _, _) => putInt(v, r.extCount)),
    "ext_headers" -> ((v, r, _, _) => putStr(v, r.extHeaders)),
    "dns_queryid" -> ((v, r, _, _) => putInt(v, r.dns.map(_.queryId))),
    "dns_flags" -> ((v, r, _, _) => putStrI(v, r.dns.map(_.flags))),
    "dns_qr" -> ((v, r, _, _) => putBool(v, r.dns.map(_.qr))),
    "dns_opcode" -> ((v, r, _, _) => putStrI(v, r.dns.map(_.opcode))),
    "dns_rcode" -> ((v, r, _, _) => putStrI(v, r.dns.map(_.rcode))),
    "dns_qname" -> ((v, r, _, _) => putStr(v, r.dns.flatMap(_.qname))),
    "dns_qtype" -> ((v, r, _, _) => putInt(v, r.dns.map(_.qtype))),
    "dns_qtype_str" -> ((v, r, _, _) => putStrI(v, r.dns.flatMap(_.qtypeStr))),
    "dns_answer" -> ((v, r, _, _) => putStrArray(v, r.dns.map(_.answer))),
    "dns_authority" -> ((v, r, _, _) => putStrArray(v, r.dns.map(_.authority))),
    "dns_additional" -> ((v, r, _, _) => putStrArray(v, r.dns.map(_.additional))),
    "pkt_idx" -> ((v, _, idx, _) => { v.appendLong(idx); () }),
    "file" -> ((v, _, _, f) => putBytes(v, f)),
    "payload" -> ((v, r, _, _) => r.payload match {
      case Some(b) => putBytes(v, b)
      case None => v.appendNull()
    }),
    "frame" -> ((v, r, _, _) => r.frame match {
      case Some(b) => putBytes(v, b)
      case None => v.appendNull()
    }))

  /** Compile the pruned schema into the per-column appender array; call
    * only when [[columnarEligible]]. */
  def colBuilder(schema: StructType): Array[ColAppender] =
    schema.fieldNames.map(colAppenders)
}
