package graft.pcap

import java.security.MessageDigest

/** Mutable per-packet accumulator; one PacketRecord built at the end.
  * Shared by the classic-pcap and pcapng container readers. */
private[pcap] final class PacketBuilder {
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

/** Per-frame L2→L4(+app) decode, container-independent: both the classic
  * libpcap reader and the pcapng reader feed captured frames through one
  * instance per stream. Semantics documented on [[PcapStreamReader]]. */
private[pcap] final class FrameDecoder(options: DecodeOptions) {
  import PcapStreamReader._

  private val md: Option[MessageDigest] =
    if (options.md5) Some(MessageDigest.getInstance("MD5")) else None

  /** Decode `data` (one captured frame) into `b`. `ts`/`tsMicro`/`size`
    * are the container's concern and must be set by the caller. */
  def decode(b: PacketBuilder, data: Array[Byte], linkType: Int): Unit = {
    md.foreach(m => b.md5v = Some(upperHex(m.digest(data))))
    b.etherType = Some(etherTypeName(linkType, data))
    ipStart(linkType, data) match {
      case Some(ip) if ip < data.length => decodeIp(b, data, ip)
      case _ => ()
    }
  }

  private def decodeIp(b: PacketBuilder, data: Array[Byte], ip: Int): Unit =
    (data(ip) >> 4) & 0xF match {
      // length guards: a frame shorter than the fixed L3 header yields a
      // record without L3 fields rather than an exception (fuzz-found;
      // the reference would AIOOBE here)
      case 4 if ip + 20 <= data.length =>
        b.ttl = Some(data(ip + 8) & 0xFF)
        b.protocol = Some(protocolName(data(ip + 9) & 0xFF))
        if (options.addrStrings) {
          b.src = Some(ipv4String(data, ip + 12))
          b.dst = Some(ipv4String(data, ip + 16))
        }
        if (isTcpUdp(b.protocol)) {
          val ihl = (data(ip) & 0xF) * 4
          decodeL4(b, data, ip, ihl, v6 = false)
        }
      case 6 if ip + 40 <= data.length =>
        b.ttl = Some(data(ip + 7) & 0xFF)
        b.payloadLen = Some(beU16(data, ip + 4))
        if (options.addrStrings) {
          b.src = Some(ipv6String(data, ip + 8))
          b.dst = Some(ipv6String(data, ip + 24))
        }
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
  private def walkV6ExtHeaders(b: PacketBuilder, data: Array[Byte], ip: Int): Int = {
    var count = 0
    var offset = 40
    var next = data(ip + 6) & 0xFF
    val chain = if (options.extHeaderStrings) new StringBuilder else null
    var result = -1
    var done = false
    while (!done && ip + offset < data.length) {
      val isExt = ExtHeaderNames.contains(next)
      val name = if (isExt) ExtHeaderNames(next) else protocolName(next)
      if (chain != null) chain.append('[').append(name).append(']')
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
    if (chain != null && chain.nonEmpty) b.extHeaders = Some(chain.toString)
    result
  }

  /** Ports + (UDP) checksum + payload slice + optional DNS decode.
    * `l4Start` is relative to ip. */
  private def decodeL4(b: PacketBuilder, data: Array[Byte], ip: Int,
      l4Start: Int, v6: Boolean): Unit = {
    val l4 = ip + l4Start
    if (l4 + 4 > data.length) return
    b.srcPort = Some(beU16(data, l4))
    b.dstPort = Some(beU16(data, l4 + 2))
    val headerSize = b.protocol match {
      case Some("UDP") =>
        if (options.udpsum) b.udpsum = udpChecksum(data, ip, l4Start, v6)
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
        data, data.length - payloadLen, data.length, options.dnsSections)
    }
    if (options.keepPayload)
      b.payload = Some(java.util.Arrays.copyOfRange(
        data, data.length - payloadLen, data.length))
  }

  /** One's-complement checksum residual over pseudo-header + captured UDP
    * segment: 0 = valid. None when the checksum field is zero or the
    * packet is too short (parity with getUdpChecksum returning -1,
    * PcapReader.java:123-165). The v6 pseudo-header fix is documented on
    * [[PcapStreamReader]]. */
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
