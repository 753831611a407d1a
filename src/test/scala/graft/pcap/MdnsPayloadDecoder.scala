package graft.pcap

/** Test-only third-party decoder, registered via the ServiceLoader seam
  * (provider file under src/test/resources/META-INF/services): multicast
  * DNS on UDP port 5353 — a protocol the shipped decoders deliberately
  * ignore, so resolution through `decoder=mdns` proves the plug-in path
  * end to end (the Spark mapping of the reference's reader-subclass
  * hook, PcapInputFormat.java:29,55-64). */
final class MdnsPayloadDecoder extends PayloadDecoder {
  override def name: String = "mdns"
  override def decode(protocol: String, srcPort: Int, dstPort: Int,
      payload: Array[Byte]): Option[DnsFields] =
    if (protocol == "UDP" && (srcPort == 5353 || dstPort == 5353))
      DnsParser.parse(payload)
    else None
}
