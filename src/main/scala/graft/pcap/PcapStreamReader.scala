package graft.pcap

import java.io.{DataInputStream, EOFException, IOException, InputStream}
import java.security.MessageDigest

/** Which optional work the decoder performs. Column pruning in the Spark
  * source maps requested columns onto these switches so unrequested work
  * (DNS parse, MD5 digest, payload retention) is skipped entirely — an
  * improvement over the reference, which always decodes every field and
  * lets the Hive SerDe drop them afterwards (SURVEY.md §4).
  */
final case class DecodeOptions(
    appDecoder: Option[PayloadDecoder] = None,
    md5: Boolean = false,
    keepPayload: Boolean = false)

object DecodeOptions {
  /** Convenience for the common case. */
  def dns: DecodeOptions = DecodeOptions(appDecoder = Some(DnsPayloadDecoder))
}

/** Streaming classic-libpcap decoder: validates the 24-byte global header,
  * then yields one [[PacketRecord]] per packet. Decoding accumulates into
  * a single mutable builder per packet (one record allocation, no
  * copy-chain churn — this loop runs per packet at 100 TB).
  *
  * Semantics match the reference decoder
  * (hadoop-pcap-lib/.../PcapReader.java) — see the quirk register in
  * SURVEY.md §7.5. Notable parity points:
  *   - little-endian container only, magic 0xA1B2C3D4 (PcapReader.java:107);
  *     pcapng / big-endian / nanosecond variants are rejected;
  *   - link types NULL(0)/EN10MB(1)/RAW(101)/LOOP(108) only
  *     (PcapReader.java:238-254), others throw at open;
  *   - empty stream yields zero packets without error
  *     (PcapReader.java:94-105);
  *   - truncated packet body yields a record carrying only `ts`
  *     (PcapReader.java:177-180);
  *   - one 802.1Q tag unwrapped; QinQ → no IP decode
  *     (PcapReader.java:288-295);
  *   - L4 decode only for TCP/UDP (PcapReader.java:199-217);
  *   - DNS decode only for UDP port 53 — DNS-over-TCP keeps its 2-byte
  *     length prefix and never parses in the reference (dnsjava), so we
  *     don't attempt it (DnsPcapReader.java:38,53-55).
  *
  * Deliberate fixes (flagged per SURVEY.md §7.5):
  *   - IPv6 UDP checksum uses a real IPv6 pseudo-header (the reference
  *     reuses IPv4 offsets on the v6 path — garbage results,
  *     PcapReader.java:140-141);
  *   - the IPv6 extension-header walk advances by the RFC 8200 sizes
  *     ((hdrExtLen+1)*8; AH (len+2)*4) — the reference advances by
  *     `1 + len` bytes (PcapReader.java:409-413), which misparses every
  *     real extension chain.
  */
final class PcapStreamReader(
    in: InputStream,
    options: DecodeOptions = DecodeOptions())
  extends Iterator[PacketRecord] {

  import PcapStreamReader._

  private val is = new DataInputStream(in)
  private var eof = false
  private var nextRec: PacketRecord = _
  private val hdrBuf = new Array[Byte](PacketHeaderSize)

  /** None only for an empty stream (parity: "skipping empty file"). */
  private val linkType: Option[Int] = {
    val hdr = new Array[Byte](GlobalHeaderSize)
    if (!readFully(hdr)) {
      if (!eof) throw new IOException("Couldn't read PCAP header")
      None
    } else {
      if (leU32(hdr, 0) != Magic)
        throw new IOException("Not a PCAP file (Couldn't find magic number)")
      val lt = leU32(hdr, 20).toInt
      if (!SupportedLinkTypes.contains(lt))
        throw new IOException(s"Unsupported link type: $lt")
      Some(lt)
    }
  }

  private val md = if (options.md5) Some(MessageDigest.getInstance("MD5")) else None

  override def hasNext: Boolean = {
    if (nextRec == null && linkType.isDefined) nextRec = readPacket()
    nextRec != null
  }

  override def next(): PacketRecord = {
    if (!hasNext) throw new NoSuchElementException("end of pcap stream")
    val r = nextRec; nextRec = null; r
  }

  private def readFully(buf: Array[Byte]): Boolean =
    try { is.readFully(buf); true }
    catch {
      case _: EOFException => eof = true; false
      case _: IOException => false
    }

  /** Mutable per-packet accumulator; one PacketRecord built at the end. */
  private final class B {
    var ts, tsMicro, size: Option[Long] = None
    var md5v, etherType, protocol, src, dst, extHeaders: Option[String] = None
    var ttl, srcPort, dstPort, udpsum, len, payloadLen, extCount: Option[Int] = None
    var frag: Option[Boolean] = None
    var dns: Option[DnsFields] = None
    var payload: Option[Array[Byte]] = None

    def build(): PacketRecord = PacketRecord(
      ts = ts, tsMicro = tsMicro, size = size, md5 = md5v,
      etherType = etherType, ttl = ttl, protocol = protocol,
      src = src, dst = dst, srcPort = srcPort, dstPort = dstPort,
      udpsum = udpsum, len = len, frag = frag, payloadLen = payloadLen,
      extCount = extCount, extHeaders = extHeaders, dns = dns,
      payload = payload)
  }

  private def readPacket(): PacketRecord = {
    if (!readFully(hdrBuf)) return null

    val tsSec = leU32(hdrBuf, 0)
    val tsUsec = leU32(hdrBuf, 4)
    val capLen = leU32(hdrBuf, 8)

    val b = new B
    b.ts = Some(tsSec)
    b.tsMicro = Some(tsSec * 1000000L + tsUsec)

    val data = new Array[Byte](capLen.toInt)
    if (!readFully(data)) return b.build() // truncated body → ts-only record

    b.size = Some(capLen)
    md.foreach(m => b.md5v = Some(upperHex(m.digest(data))))
    b.etherType = Some(etherTypeName(linkType.get, data))

    ipStart(linkType.get, data) match {
      case Some(ip) if ip < data.length => decodeIp(b, data, ip)
      case _ => ()
    }
    b.build()
  }

  private def decodeIp(b: B, data: Array[Byte], ip: Int): Unit =
    (data(ip) >> 4) & 0xF match {
      // length guards: a frame shorter than the fixed L3 header yields a
      // record without L3 fields rather than an exception (fuzz-found;
      // the reference would AIOOBE here)
      case 4 if ip + 20 <= data.length =>
        b.ttl = Some(data(ip + 8) & 0xFF)
        b.protocol = Some(protocolName(data(ip + 9) & 0xFF))
        b.src = Some(ipv4String(data, ip + 12))
        b.dst = Some(ipv4String(data, ip + 16))
        if (isTcpUdp(b.protocol)) {
          val ihl = (data(ip) & 0xF) * 4
          decodeL4(b, data, ip, ihl, v6 = false)
        }
      case 6 if ip + 40 <= data.length =>
        b.ttl = Some(data(ip + 7) & 0xFF)
        b.payloadLen = Some(beU16(data, ip + 4))
        b.src = Some(ipv6String(data, ip + 8))
        b.dst = Some(ipv6String(data, ip + 24))
        val dataStart = walkV6ExtHeaders(b, data, ip)
        if (dataStart > 0 && isTcpUdp(b.protocol))
          decodeL4(b, data, ip, dataStart, v6 = true)
      case _ => ()
    }

  private def isTcpUdp(p: Option[String]): Boolean =
    p match {
      case Some(s) => s == "TCP" || s == "UDP"
      case None => false
    }

  /** Walk the v6 extension chain. Returns the L4 offset from ip —
    * -1 when No-Next-Header terminates the chain. */
  private def walkV6ExtHeaders(b: B, data: Array[Byte], ip: Int): Int = {
    var count = 0
    var offset = 40
    var next = data(ip + 6) & 0xFF
    val chain = new StringBuilder
    var result = -1
    var done = false
    while (!done && ip + offset < data.length) {
      val isExt = ExtHeaderNames.contains(next)
      val name = if (isExt) ExtHeaderNames(next) else protocolName(next)
      chain.append('[').append(name).append(']')
      if (next == NoNextHeader) {
        done = true                       // result stays -1
      } else if (!isExt) {
        b.protocol = Some(name)
        result = offset
        done = true
      } else {
        count += 1
        if (next == FragmentHeader) {
          b.frag = Some(true)
          next = data(ip + offset) & 0xFF
          offset += 8                     // fragment header is fixed 8 bytes
        } else if (ip + offset + 1 >= data.length) {
          done = true                     // ext header length byte truncated
        } else if (next == AuthHeader) {
          next = data(ip + offset) & 0xFF
          offset += ((data(ip + offset + 1) & 0xFF) + 2) * 4
        } else {
          next = data(ip + offset) & 0xFF
          offset += ((data(ip + offset + 1) & 0xFF) + 1) * 8
        }
      }
    }
    b.extCount = Some(count)
    if (chain.nonEmpty) b.extHeaders = Some(chain.toString)
    result
  }

  /** Ports + (UDP) checksum + payload slice + optional DNS decode.
    * `l4Start` is relative to ip. */
  private def decodeL4(b: B, data: Array[Byte], ip: Int, l4Start: Int,
      v6: Boolean): Unit = {
    val l4 = ip + l4Start
    if (l4 + 4 > data.length) return
    b.srcPort = Some(beU16(data, l4))
    b.dstPort = Some(beU16(data, l4 + 2))
    val headerSize = b.protocol match {
      case Some("UDP") =>
        b.udpsum = udpChecksum(data, ip, l4Start, v6)
        8
      case Some("TCP") =>
        if (l4 + 13 > data.length) return
        ((data(l4 + 12) >> 4) & 0xF) * 4
      case _ => return
    }
    val payloadStart = l4 + headerSize
    val payloadLen =
      if (payloadStart > data.length) 0 else data.length - payloadStart
    b.len = Some(payloadLen)
    // app-layer decode runs in place over the frame — no payload copy
    options.appDecoder.foreach { dec =>
      b.dns = dec.decodeAt(b.protocol.get, b.srcPort.get, b.dstPort.get,
        data, data.length - payloadLen, data.length)
    }
    if (options.keepPayload)
      b.payload = Some(java.util.Arrays.copyOfRange(
        data, data.length - payloadLen, data.length))
  }

  /** One's-complement checksum residual over pseudo-header + captured UDP
    * segment: 0 = valid. None when the checksum field is zero or the
    * packet is too short (parity with getUdpChecksum returning -1,
    * PcapReader.java:123-165). The v6 pseudo-header fix is documented in
    * the class Scaladoc. */
  private def udpChecksum(data: Array[Byte], ip: Int, l4Start: Int, v6: Boolean): Option[Int] = {
    val l4 = ip + l4Start
    try {
      if (data(l4 + 6) == 0 && data(l4 + 7) == 0) return None
      val addrLen = if (v6) 16 else 4
      val srcOff = if (v6) ip + 8 else ip + 12
      val dstOff = if (v6) ip + 24 else ip + 16
      val segLen = data.length - l4
      var sum = 0
      var i = 0
      // pseudo-header: src, dst, 0, proto(17), udp length — summed with
      // the reference's byte-position weighting (even → high byte)
      while (i < addrLen) {
        sum += (data(srcOff + i) & 0xFF) << (if (i % 2 == 0) 8 else 0)
        i += 1
      }
      i = 0
      while (i < addrLen) {
        sum += (data(dstOff + i) & 0xFF) << (if (i % 2 == 0) 8 else 0)
        i += 1
      }
      sum += 17 // [0, 17] at even/odd positions
      sum += (data(l4 + 4) & 0xFF) << 8
      sum += data(l4 + 5) & 0xFF
      i = 0
      while (i < segLen) {
        sum += (data(l4 + i) & 0xFF) << (if (i % 2 == 0) 8 else 0)
        i += 1
      }
      sum = (sum >> 16) + (sum & 0xFFFF)
      sum += sum >> 16
      Some(~sum & 0xFFFF)
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}

object PcapStreamReader {
  val Magic = 0xA1B2C3D4L
  val GlobalHeaderSize = 24
  val PacketHeaderSize = 16
  val SupportedLinkTypes: Set[Int] = Set(0, 1, 101, 108)
  val NoNextHeader = 59
  val FragmentHeader = 44
  val AuthHeader = 51

  val ProtocolNames: Map[Int, String] = Map(
    1 -> "ICMP", 6 -> "TCP", 17 -> "UDP",
    46 -> "RSVP", 47 -> "GRE", 58 -> "ICMPv6")

  val ExtHeaderNames: Map[Int, String] = Map(
    0 -> "HopByHop", 43 -> "Routing", 44 -> "Fragment",
    50 -> "ESP", 51 -> "AuthHeader", 60 -> "DestOpts", 135 -> "Mobility")

  def protocolName(id: Int): String = ProtocolNames.getOrElse(id, id.toString)

  def leU32(b: Array[Byte], off: Int): Long =
    ((b(off + 3) & 0xFFL) << 24) | ((b(off + 2) & 0xFFL) << 16) |
    ((b(off + 1) & 0xFFL) << 8) | (b(off) & 0xFFL)

  def beU16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  /** Ethertype display name; "" for non-Ethernet links
    * (PcapReader.java:257-281). */
  def etherTypeName(linkType: Int, frame: Array[Byte]): String =
    if (linkType != 1) ""
    else if (frame.length < 14) ""
    else beU16(frame, 12) match {
      case 0x0800 => "IPv4"
      case 0x0806 => "arp"
      case 0x8035 => "rarp"
      case 0x86DD => "IPv6"
      case 0x8100 => "vlan"
      case other => f"0x$other%04x"
    }

  /** Offset of the IP header in the frame, None when not IP
    * (PcapReader.java:283-303): one 802.1Q tag unwrapped on Ethernet. */
  def ipStart(linkType: Int, frame: Array[Byte]): Option[Int] = linkType match {
    case 0 | 101 => Some(0)
    case 108 => Some(4)
    case 1 =>
      if (frame.length < 14) None
      else {
        var start = 14
        var et = beU16(frame, 12)
        if (et == 0x8100 && frame.length >= 18) {
          et = beU16(frame, 16)
          start += 4
        }
        if (et == 0x0800 || et == 0x86DD) Some(start) else None
      }
    case _ => None
  }

  def ipv4String(b: Array[Byte], off: Int): String =
    s"${b(off) & 0xFF}.${b(off + 1) & 0xFF}.${b(off + 2) & 0xFF}.${b(off + 3) & 0xFF}"

  /** RFC-form IPv6 text via InetAddress, matching
    * PcapReaderUtil.convertIPv6Address (java.net formatting, no `::`
    * compression). */
  def ipv6String(b: Array[Byte], off: Int): String =
    java.net.InetAddress.getByAddress(
      java.util.Arrays.copyOfRange(b, off, off + 16)).getHostAddress

  def upperHex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xFF}%02X"))
    sb.toString
  }
}
