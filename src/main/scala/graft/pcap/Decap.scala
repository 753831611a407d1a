package graft.pcap

/** Tunnel decapsulation — VXLAN (RFC 7348) to start. The reference has
  * no tunnel handling at all (an encapsulated capture decodes as
  * opaque outer UDP, `PcapReader.java` stops at L4); real capture
  * estates are full of VXLAN (every overlay datacenter fabric), where
  * the analytically-interesting flow is the INNER one.
  *
  * Decap reuses the one [[FrameDecoder]] for the inner Ethernet frame
  * — the inner packet gets the same L2/L3/L4/DNS treatment (and the
  * same fuzz-hardened bounds behavior) as a top-level frame, rather
  * than a second hand-rolled parser that would drift. Exposed as a
  * plain function over the `payload` column so the operator side stays
  * a normal DataFrame plan (filter on outer port 4789 → decap →
  * aggregate); a malformed or non-VXLAN payload yields None, never a
  * throw (untrusted capture bytes).
  */
object Decap extends Serializable {

  /** Inner-packet fields the VXLAN queries consume. Flattened (not the
    * full PacketRecord) so it has a clean implicit Encoder for
    * Dataset.mapPartitions. */
  final case class VxlanInner(
      vni: Int,
      src: String, dst: String,
      protocol: String,
      srcPort: Int, dstPort: Int,
      dnsQname: Option[String],
      dnsRcode: Option[String])

  /** IANA-assigned VXLAN outer UDP destination port. */
  val VxlanPort = 4789

  // one decoder per thread: PacketBuilder/FrameDecoder are cheap but
  // mutable; mapPartitions tasks share the object across rows
  private val decoders =
    new ThreadLocal[FrameDecoder] {
      override def initialValue(): FrameDecoder =
        new FrameDecoder(DecodeOptions(
          appDecoder = Some(DnsPayloadDecoder),
          udpsum = false, extHeaderStrings = false, dnsSections = false))
    }

  /** Decap one outer-UDP payload. RFC 7348 §5: 8-byte header — flags
    * (bit 3 = "VNI valid", MUST be set), 24-bit VNI at bytes 4-6 —
    * then the inner Ethernet frame. */
  def vxlan(payload: Array[Byte]): Option[VxlanInner] = {
    if (payload == null || payload.length < 8 + 14) return None
    if ((payload(0) & 0x08) == 0) return None
    val vni = ((payload(4) & 0xFF) << 16) |
      ((payload(5) & 0xFF) << 8) | (payload(6) & 0xFF)
    val b = new PacketBuilder
    decoders.get().decode(b, payload, 8, payload.length - 8, linkType = 1)
    for {
      src <- b.src
      dst <- b.dst
      proto <- b.protocol
      sp <- b.srcPort
      dp <- b.dstPort
    } yield VxlanInner(vni, src, dst, proto, sp, dp,
      b.dns.flatMap(_.qname), b.dns.map(_.rcode))
  }
}
