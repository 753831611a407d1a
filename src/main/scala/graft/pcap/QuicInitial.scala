package graft.pcap

import java.nio.charset.StandardCharsets.US_ASCII

import javax.crypto.{Cipher, Mac}
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** Clean-room QUIC Initial-packet protection (RFC 9001, plus the v2
  * re-labeling of RFC 9369) — decrypt AND encrypt, so the synth fixture
  * and the scan exercise the same spec from both directions.
  *
  * QUIC Initial packets are encrypted, but with keys derived ONLY from
  * the client's Destination Connection ID and a version-specific salt
  * published in the RFC (RFC 9001 §5.2: "this provides protection
  * against off-path attackers", not confidentiality) — which is exactly
  * why passive capture analytics can still read the TLS ClientHello,
  * recover the SNI/ALPN, and fingerprint client stacks on QUIC flows
  * the TCP-based `pcap_tls_sni` query can no longer see. The reference
  * decodes no QUIC at all (it predates it); this is modern-capture
  * surface unlocked by the payload column.
  *
  * The pipeline per packet (all from the public RFCs):
  *   1. long-header parse (RFC 8999 invariants + RFC 9000 §17.2.2)
  *   2. initial secrets: HKDF-Extract(salt_version, DCID) then
  *      HKDF-Expand-Label per RFC 8446 §7.1 ("client in" → key/iv/hp)
  *   3. header protection removal (RFC 9001 §5.4: AES-ECB mask over the
  *      16-byte sample at pn_offset+4)
  *   4. AEAD open: AES-128-GCM, nonce = iv XOR packet-number, AAD = the
  *      unprotected header bytes
  *   5. frame walk (RFC 9000 §19: PADDING/PING/ACK/CRYPTO/CC), CRYPTO
  *      segments reassembled by offset
  *   6. the assembled CRYPTO stream is a TLS handshake message WITHOUT
  *      the record layer; a synthetic 5-byte record header re-uses
  *      [[graft.functions.TlsParse]] unchanged.
  *
  * Everything is JDK crypto (`javax.crypto` HMAC-SHA256 / AES) — no new
  * dependencies. Malformed, truncated, bit-flipped, non-Initial, or
  * unknown-version input returns null (never throws); QuicInitialSpec
  * fuzzes this and cross-checks the fixture against an INDEPENDENT
  * Python decryptor built on the `cryptography` library's own HKDF.
  */
object QuicInitial {

  /** RFC 9001 §5.2. */
  private val SaltV1: Array[Byte] = hex("38762cf7f55934b34d179ae6a4c80cadccbb7f0a")
  /** RFC 9369 §3.3.1. */
  private val SaltV2: Array[Byte] = hex("0dede3def700a6db819381be6e269dcbf9bd2ed9")

  final val V1 = 0x00000001L
  final val V2 = 0x6B3343CFL

  def hex(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  def toHex(b: Array[Byte]): String = b.map(x => f"${x & 0xFF}%02x").mkString

  // ----- HKDF (RFC 5869, SHA-256) + TLS 1.3 Expand-Label (RFC 8446 §7.1)

  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(if (key.isEmpty) new Array[Byte](32) else key,
      "HmacSHA256"))
    m.doFinal(data)
  }

  def hkdfExtract(salt: Array[Byte], ikm: Array[Byte]): Array[Byte] =
    hmac(salt, ikm)

  def hkdfExpand(prk: Array[Byte], info: Array[Byte], len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var t = Array.emptyByteArray
    var filled = 0
    var counter = 1
    while (filled < len) {
      t = hmac(prk, t ++ info ++ Array(counter.toByte))
      val n = math.min(t.length, len - filled)
      System.arraycopy(t, 0, out, filled, n)
      filled += n
      counter += 1
    }
    out
  }

  /** HKDF-Expand-Label(secret, label, "", len) with the "tls13 " prefix
    * (RFC 8446 §7.1); QUIC always uses an empty context. */
  def hkdfExpandLabel(secret: Array[Byte], label: String, len: Int): Array[Byte] = {
    val lab = ("tls13 " + label).getBytes(US_ASCII)
    val info = Array[Byte]((len >> 8).toByte, (len & 0xFF).toByte,
      lab.length.toByte) ++ lab ++ Array[Byte](0)
    hkdfExpand(secret, info, len)
  }

  /** (key16, iv12, hp16) for one direction of the Initial space.
    * `client` = the keys the CLIENT writes with (what a passive tap
    * needs to open client Initials). */
  def initialKeys(version: Long, dcid: Array[Byte], client: Boolean)
      : Option[(Array[Byte], Array[Byte], Array[Byte])] = {
    val (salt, pfx) = version match {
      case V1 => (SaltV1, "quic")
      case V2 => (SaltV2, "quicv2")
      case _ => return None
    }
    val initial = hkdfExtract(salt, dcid)
    val side = hkdfExpandLabel(initial,
      if (client) "client in" else "server in", 32)
    Some((hkdfExpandLabel(side, pfx + " key", 16),
      hkdfExpandLabel(side, pfx + " iv", 12),
      hkdfExpandLabel(side, pfx + " hp", 16)))
  }

  // ----- AES primitives (thread-local Cipher reuse: JCA getInstance is
  // a service lookup + allocation we keep out of the per-row path)

  private val ecbLocal = new ThreadLocal[Cipher] {
    override def initialValue(): Cipher =
      Cipher.getInstance("AES/ECB/NoPadding")
  }
  private val gcmLocal = new ThreadLocal[Cipher] {
    override def initialValue(): Cipher =
      Cipher.getInstance("AES/GCM/NoPadding")
  }

  /** RFC 9001 §5.4.3: mask = AES-ECB(hp_key, sample). */
  def hpMask(hp: Array[Byte], sample: Array[Byte]): Array[Byte] = {
    val c = ecbLocal.get()
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(hp, "AES"))
    c.doFinal(sample)
  }

  private def nonceFor(iv: Array[Byte], pn: Long): Array[Byte] = {
    val n = iv.clone()
    var i = 0
    while (i < 8) { n(11 - i) = (n(11 - i) ^ ((pn >>> (8 * i)) & 0xFF)).toByte; i += 1 }
    n
  }

  def gcmOpen(key: Array[Byte], iv: Array[Byte], pn: Long,
      aad: Array[Byte], ct: Array[Byte]): Option[Array[Byte]] =
    try {
      val c = gcmLocal.get()
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
        new GCMParameterSpec(128, nonceFor(iv, pn)))
      c.updateAAD(aad)
      Some(c.doFinal(ct))
    } catch { case _: java.security.GeneralSecurityException => None }

  def gcmSeal(key: Array[Byte], iv: Array[Byte], pn: Long,
      aad: Array[Byte], pt: Array[Byte]): Array[Byte] = {
    // fresh instance: the JDK forbids re-initializing one Cipher for
    // ENCRYPT with a (key, iv) pair it has already encrypted under
    // (GCM nonce-reuse guard) — sealing is synth-side only, so the
    // per-call allocation is irrelevant
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, nonceFor(iv, pn)))
    c.updateAAD(aad)
    c.doFinal(pt)
  }

  // ----- varint (RFC 9000 §16) -----------------------------------------

  /** Returns (value, bytesConsumed) or null-equivalent (-1, 0) on
    * truncation. */
  @inline private def varint(b: Array[Byte], off: Int, end: Int): (Long, Int) = {
    if (off >= end) return (-1L, 0)
    val first = b(off) & 0xFF
    val len = 1 << (first >> 6)
    if (off + len > end) return (-1L, 0)
    var v = (first & 0x3F).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(off + i) & 0xFF); i += 1 }
    (v, len)
  }

  def encodeVarint(v: Long): Array[Byte] =
    if (v < 64) Array(v.toByte)
    else if (v < 16384) Array((0x40 | (v >> 8)).toByte, v.toByte)
    else if (v < 1073741824L)
      Array((0x80 | (v >> 24)).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    else {
      val out = new Array[Byte](8)
      var i = 0
      while (i < 8) { out(7 - i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
      out(0) = (out(0) | 0xC0).toByte
      out
    }

  // ----- decrypt --------------------------------------------------------

  /** Everything a passive tap learns from one client Initial. `sni`,
    * `alpn`, `tlsVersion`, `cipherCount`, `fp` are null/-1 when the
    * CRYPTO stream doesn't carry a complete ClientHello (split across
    * datagrams, or an unknown frame type stopped the walk). */
  final case class Opened(
      version: Long,
      dcid: Array[Byte],
      scid: Array[Byte],
      tokenLen: Int,
      pktNum: Long,
      crypto: Array[Byte])

  /** Decrypt the FIRST QUIC packet in the datagram if it is a client
    * Initial of a known version; null otherwise (short header,
    * version negotiation, retry, handshake-space, unknown version,
    * malformed lengths, failed auth). Coalesced packets after the
    * Initial (RFC 9000 §12.2) are ignored — the Initial is by
    * definition first. */
  def open(datagram: Array[Byte]): Opened = {
    val b = datagram
    val end = b.length
    if (end < 7) return null
    val first = b(0) & 0xFF
    if ((first & 0x80) == 0) return null               // short header
    if ((first & 0x40) == 0) return null               // fixed bit (RFC 8999)
    val version = ((b(1) & 0xFFL) << 24) | ((b(2) & 0xFFL) << 16) |
      ((b(3) & 0xFFL) << 8) | (b(4) & 0xFFL)
    // Initial packet type: v1 TT=00 (RFC 9000 §17.2.2); v2 TT=01
    // (RFC 9369 §3.2 rotates the type space)
    val wantType = version match {
      case V1 => 0
      case V2 => 1
      case _ => return null                            // incl. negotiation (0)
    }
    if (((first >> 4) & 0x03) != wantType) return null
    var p = 5
    val dcidLen = b(p) & 0xFF
    p += 1
    if (dcidLen > 20 || p + dcidLen > end) return null // RFC 9000 §17.2
    val dcid = java.util.Arrays.copyOfRange(b, p, p + dcidLen)
    p += dcidLen
    if (p >= end) return null
    val scidLen = b(p) & 0xFF
    p += 1
    if (scidLen > 20 || p + scidLen > end) return null
    val scid = java.util.Arrays.copyOfRange(b, p, p + scidLen)
    p += scidLen
    val (tokenLen, tlSize) = varint(b, p, end)
    if (tlSize == 0 || tokenLen > end - p - tlSize) return null
    p += tlSize + tokenLen.toInt
    val (length, lenSize) = varint(b, p, end)
    if (lenSize == 0 || length < 20) return null       // pn + 16-byte tag min
    p += lenSize
    val pnOffset = p
    if (pnOffset + length > end) return null
    // header protection removal: sample starts 4 bytes past the
    // EARLIEST possible pn start (RFC 9001 §5.4.2 — pn length is not
    // yet known, so the sample offset assumes the 4-byte maximum... no:
    // the spec pins sample_offset = pn_offset + 4 exactly)
    if (pnOffset + 4 + 16 > end) return null
    val keys = initialKeys(version, dcid, client = true).getOrElse(return null)
    val (key, iv, hp) = keys
    val mask = hpMask(hp, java.util.Arrays.copyOfRange(b, pnOffset + 4, pnOffset + 20))
    val firstClear = first ^ (mask(0) & 0x0F)
    if ((firstClear & 0x0C) != 0) return null          // reserved bits (§17.2)
    val pnLen = (firstClear & 0x03) + 1
    if (pnOffset + pnLen + 16 > pnOffset + length) return null
    var pn = 0L
    var i = 0
    while (i < pnLen) {
      pn = (pn << 8) | ((b(pnOffset + i) ^ mask(1 + i)) & 0xFF)
      i += 1
    }
    // stateless single-packet view: no largest-acked to widen against,
    // and the Initial pn space is tiny, so the truncated value IS the
    // packet number (RFC 9000 §A.3 with expected = 0)
    val aad = java.util.Arrays.copyOfRange(b, 0, pnOffset + pnLen)
    aad(0) = firstClear.toByte
    i = 0
    while (i < pnLen) { aad(pnOffset + i) = (b(pnOffset + i) ^ mask(1 + i)).toByte; i += 1 }
    val ct = java.util.Arrays.copyOfRange(b, pnOffset + pnLen,
      pnOffset + length.toInt)
    val pt = gcmOpen(key, iv, pn, aad, ct).getOrElse(return null)
    val crypto = assembleCrypto(pt)
    Opened(version, dcid, scid, tokenLen.toInt, pn, crypto)
  }

  /** Walk the frame sequence (RFC 9000 §19) and reassemble CRYPTO
    * segments by offset. Returns the contiguous-from-zero stream, or
    * null when an unknown frame type makes the remainder unparseable
    * or the segments leave a gap. Initial packets may legally carry
    * PADDING, PING, ACK, CRYPTO, and CONNECTION_CLOSE only
    * (RFC 9000 §17.2.2). */
  private def assembleCrypto(pt: Array[Byte]): Array[Byte] = {
    val end = pt.length
    var p = 0
    var segs = List.empty[(Long, Array[Byte])]
    while (p < end) {
      val t = pt(p) & 0xFF
      t match {
        case 0x00 | 0x01 => p += 1                      // PADDING / PING
        case 0x02 | 0x03 =>                             // ACK [+ECN]
          p += 1
          val (_, s1) = varint(pt, p, end); if (s1 == 0) return null
          p += s1
          val (_, s2) = varint(pt, p, end); if (s2 == 0) return null
          p += s2
          val (rc, s3) = varint(pt, p, end); if (s3 == 0) return null
          p += s3
          val (_, s4) = varint(pt, p, end); if (s4 == 0) return null
          p += s4
          var r = 0L
          while (r < rc) {
            val (_, g) = varint(pt, p, end); if (g == 0) return null
            p += g
            val (_, l) = varint(pt, p, end); if (l == 0) return null
            p += l
            r += 1
          }
          if (t == 0x03) {
            var e = 0
            while (e < 3) {
              val (_, s) = varint(pt, p, end); if (s == 0) return null
              p += s; e += 1
            }
          }
        case 0x06 =>                                    // CRYPTO
          p += 1
          val (off, s1) = varint(pt, p, end); if (s1 == 0) return null
          p += s1
          val (len, s2) = varint(pt, p, end); if (s2 == 0) return null
          p += s2
          if (len > end - p) return null
          segs = (off, java.util.Arrays.copyOfRange(pt, p, p + len.toInt)) :: segs
          p += len.toInt
        case 0x1C | 0x1D =>                             // CONNECTION_CLOSE
          p += 1
          val (_, s1) = varint(pt, p, end); if (s1 == 0) return null
          p += s1
          if (t == 0x1C) {
            val (_, sf) = varint(pt, p, end); if (sf == 0) return null
            p += sf
          }
          val (rl, s2) = varint(pt, p, end); if (s2 == 0) return null
          p += s2
          if (rl > end - p) return null
          p += rl.toInt
        case _ => return null
      }
    }
    if (segs.isEmpty) return Array.emptyByteArray
    val sorted = segs.sortBy(_._1)
    val total = sorted.map(_._2.length.toLong).sum
    if (total > (1 << 22)) return null                  // bomb cap: 4 MiB
    val out = new java.io.ByteArrayOutputStream(total.toInt)
    var next = 0L
    for ((off, data) <- sorted) {
      if (off > next) return null                       // gap
      val skip = (next - off).toInt                     // overlap: keep first
      if (skip < data.length) {
        out.write(data, skip, data.length - skip)
        next = off + data.length
      }
    }
    out.toByteArray
  }

  // ----- encrypt (the synth side; same spec, opposite direction) -------

  /** Build one protected client Initial. `frames` is the cleartext
    * payload (caller lays out CRYPTO/PADDING frames); the datagram is
    * NOT auto-padded — pad via PADDING frames to honor RFC 9000 §14.1's
    * 1200-byte minimum. `pnLen` ∈ 1..4. */
  def seal(version: Long, dcid: Array[Byte], scid: Array[Byte],
      token: Array[Byte], pn: Long, pnLen: Int, frames: Array[Byte]): Array[Byte] = {
    require(pnLen >= 1 && pnLen <= 4, s"pnLen $pnLen")
    val (key, iv, hp) = initialKeys(version, dcid, client = true).get
    val typeBits = if (version == V2) 1 else 0
    val firstClear = 0xC0 | (typeBits << 4) | (pnLen - 1)
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(firstClear)
    hdr.write(((version >> 24) & 0xFF).toInt); hdr.write(((version >> 16) & 0xFF).toInt)
    hdr.write(((version >> 8) & 0xFF).toInt); hdr.write((version & 0xFF).toInt)
    hdr.write(dcid.length); hdr.write(dcid)
    hdr.write(scid.length); hdr.write(scid)
    hdr.write(encodeVarint(token.length.toLong)); hdr.write(token)
    hdr.write(encodeVarint(pnLen.toLong + frames.length + 16))
    val pnOffset = hdr.size()
    var i = pnLen - 1
    while (i >= 0) { hdr.write(((pn >>> (8 * i)) & 0xFF).toInt); i -= 1 }
    val aad = hdr.toByteArray
    val ct = gcmSeal(key, iv, pn, aad, frames)
    val pkt = aad ++ ct
    val mask = hpMask(hp, java.util.Arrays.copyOfRange(pkt, pnOffset + 4, pnOffset + 20))
    pkt(0) = (pkt(0) ^ (mask(0) & 0x0F)).toByte
    i = 0
    while (i < pnLen) { pkt(pnOffset + i) = (pkt(pnOffset + i) ^ mask(1 + i)).toByte; i += 1 }
    pkt
  }

  /** CRYPTO frame with explicit offset (2-byte varint length so split
    * points don't change framing size class). */
  def cryptoFrame(offset: Long, data: Array[Byte]): Array[Byte] = {
    // the 2-byte varint form carries at most 14 bits — fail loudly
    // instead of emitting a misframed packet for an oversized payload
    require(data.length <= 0x3FFF,
      s"cryptoFrame: ${data.length} B exceeds the 2-byte varint cap (16383)")
    Array[Byte](0x06) ++ encodeVarint(offset) ++
      Array[Byte]((0x40 | (data.length >> 8)).toByte, (data.length & 0xFF).toByte) ++
      data
  }
}
