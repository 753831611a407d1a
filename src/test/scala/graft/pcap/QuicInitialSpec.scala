package graft.pcap

import org.scalatest.funsuite.AnyFunSuite

import graft.pcap.{QuicInitial => QI}

/** QUIC Initial protection (RFC 9001/9369): spec-derived golden vectors
  * for the key schedule (RFC 5869 + RFC 9001 Appendix A.1), seal/open
  * round-trips across the header parameter space, crypto-level rejection
  * (every decoy must fail through GCM auth, not shape heuristics), and
  * an INDEPENDENT Python decryptor (tools/quic_oracle.py — the
  * `cryptography` library's own HKDF/AES, zero shared code) over the
  * fixture capture. */
class QuicInitialSpec extends AnyFunSuite {

  // ----- HKDF golden vectors (RFC 5869 Appendix A, SHA-256 cases) ------

  test("HKDF-Extract/Expand match RFC 5869 A.1") {
    val ikm = Array.fill[Byte](22)(0x0B)
    val salt = QI.hex("000102030405060708090a0b0c")
    val info = QI.hex("f0f1f2f3f4f5f6f7f8f9")
    val prk = QI.hkdfExtract(salt, ikm)
    assert(QI.toHex(prk) ==
      "077709362c2e32df0ddc3f0dc47bba6390b6c73bb50f9c3122ec844ad7c2b3e5")
    assert(QI.toHex(QI.hkdfExpand(prk, info, 42)) ==
      "3cb25f25faacd57a90434f64d0362f2a2d2d0a90cf1a5a4c5db02d56ecc4c5bf" +
        "34007208d5b887185865")
  }

  test("HKDF matches RFC 5869 A.2 (long inputs, multi-block expand)") {
    val ikm = Array.tabulate[Byte](80)(i => i.toByte)
    val salt = Array.tabulate[Byte](80)(i => (0x60 + i).toByte)
    val info = Array.tabulate[Byte](80)(i => (0xB0 + i).toByte)
    val prk = QI.hkdfExtract(salt, ikm)
    assert(QI.toHex(QI.hkdfExpand(prk, info, 82)) ==
      "b11e398dc80327a1c8e7f78c596a49344f012eda2d4efad8a050cc4c19afa97c" +
        "59045a99cac7827271cb41c65e590e09da3275600c2f09b8367793a9aca3db71" +
        "cc30c58179ec3e87c14c01d5c1f3434f1d87")
  }

  test("HKDF matches RFC 5869 A.3 (empty salt and info)") {
    val ikm = Array.fill[Byte](22)(0x0B)
    val prk = QI.hkdfExtract(Array.emptyByteArray, ikm)
    assert(QI.toHex(QI.hkdfExpand(prk, Array.emptyByteArray, 42)) ==
      "8da4e775a563c18f715f802a063c5a31b8a11f5c5ee1879ec3454e5f3c738d2d" +
        "9d201395faa4b61a96c8")
  }

  // ----- RFC 9001 Appendix A.1: v1 initial key schedule -----------------

  test("v1 client initial keys match RFC 9001 A.1 for DCID 8394c8f03e515708") {
    val (key, iv, hp) =
      QI.initialKeys(QI.V1, QI.hex("8394c8f03e515708"), client = true).get
    assert(QI.toHex(key) == "1f369613dd76d5467730efcbe3b1a22d")
    assert(QI.toHex(iv) == "fa044b2f42a3fd3b46fb255c")
    assert(QI.toHex(hp) == "9f50449e04a0e810283a1e9933adedd2")
  }

  test("server-side labels derive distinct keys (RFC 9001 A.1 server hp)") {
    val (_, _, chp) =
      QI.initialKeys(QI.V1, QI.hex("8394c8f03e515708"), client = true).get
    val (_, _, shp) =
      QI.initialKeys(QI.V1, QI.hex("8394c8f03e515708"), client = false).get
    assert(QI.toHex(shp) != QI.toHex(chp))
    assert(QI.toHex(shp) == "c206b8d9b9f0f37644430b490eeaa314")
  }

  test("unknown version yields no keys") {
    assert(QI.initialKeys(0xFF00001DL, QI.hex("01020304"), client = true).isEmpty)
  }

  // ----- seal/open round-trips ------------------------------------------

  private def roundTrip(version: Long, pnLen: Int, pn: Long,
      token: Array[Byte], split: Boolean): Unit = {
    val ch = PcapSynth.tlsClientHello(7).drop(5)
    val frames = scala.collection.mutable.ArrayBuffer[Byte]()
    if (split) {
      val mid = ch.length / 2
      frames ++= QI.cryptoFrame(mid.toLong, ch.drop(mid))
      frames ++= QI.cryptoFrame(0L, ch.take(mid))
    } else frames ++= QI.cryptoFrame(0L, ch)
    while (frames.length < 1200) frames += 0x00
    val dcid = QI.hex("a1b2c3d4e5f60718")
    val pkt = QI.seal(version, dcid, QI.hex("0badcafe"), token, pn, pnLen,
      frames.toArray)
    val o = QI.open(pkt)
    assert(o != null, s"open failed v=$version pnLen=$pnLen")
    assert(o.version == version)
    assert(QI.toHex(o.dcid) == QI.toHex(dcid))
    assert(QI.toHex(o.scid) == "0badcafe")
    assert(o.tokenLen == token.length)
    assert(o.pktNum == pn)
    assert(java.util.Arrays.equals(o.crypto, ch))
  }

  test("seal/open round-trips: v1+v2, pn lengths 1-4, token, split CRYPTO") {
    for (v <- Seq(QI.V1, QI.V2); pnLen <- 1 to 4; split <- Seq(false, true))
      roundTrip(v, pnLen, pn = (1L << (8 * (pnLen - 1))) - 1,
        token = if (split) QI.hex("feedface00112233") else Array.emptyByteArray,
        split = split)
  }

  test("any flipped ciphertext bit fails GCM auth -> null") {
    val ch = PcapSynth.tlsClientHello(3).drop(5)
    val frames = QI.cryptoFrame(0L, ch) ++ new Array[Byte](1200)
    val pkt = QI.seal(QI.V1, QI.hex("0102030405060708"), QI.hex("aa"),
      Array.emptyByteArray, 2L, 2, frames)
    for (pos <- Seq(40, pkt.length / 2, pkt.length - 1)) {
      val bad = pkt.clone()
      bad(pos) = (bad(pos) ^ 0x01).toByte
      assert(QI.open(bad) == null, s"flip at $pos not rejected")
    }
  }

  test("non-Initial forms are null: short header, VNEG, retry-typed, unknown version") {
    val ch = QI.cryptoFrame(0L, PcapSynth.tlsClientHello(1).drop(5)) ++
      new Array[Byte](1200)
    val good = QI.seal(QI.V1, QI.hex("1122334455667788"), QI.hex("bb"),
      Array.emptyByteArray, 0L, 1, ch)
    assert(QI.open(good) != null)
    val short = good.clone(); short(0) = (short(0) & 0x7F).toByte
    assert(QI.open(short) == null)
    val noFixed = good.clone(); noFixed(0) = (noFixed(0) & ~0x40).toByte
    assert(QI.open(noFixed) == null)
    val vneg = good.clone(); vneg(1) = 0; vneg(2) = 0; vneg(3) = 0; vneg(4) = 0
    assert(QI.open(vneg) == null)
    val draft = good.clone(); draft(1) = 0xFF.toByte; draft(4) = 0x1D
    assert(QI.open(draft) == null)
    // v2 Initial type is 01 — a v1-typed first byte under version v2
    // is HANDSHAKE space, not Initial
    val v2 = QI.seal(QI.V2, QI.hex("1122334455667788"), QI.hex("bb"),
      Array.emptyByteArray, 0L, 1, ch)
    val wrongType = v2.clone()
    wrongType(0) = (wrongType(0) ^ 0x10).toByte       // flip TT to 00
    assert(QI.open(wrongType) == null)
  }

  test("reserved bits set after unprotection -> null (RFC 9000 §17.2)") {
    // re-seal by hand with a reserved bit in the clear first byte
    val dcid = QI.hex("0807060504030201")
    val (key, iv, hp) = QI.initialKeys(QI.V1, dcid, client = true).get
    val frames = QI.cryptoFrame(0L, PcapSynth.tlsClientHello(2).drop(5)) ++
      new Array[Byte](1200)
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(0xC8)                                   // Initial, RR=10, pnLen 1
    hdr.write(Array[Byte](0, 0, 0, 1)); hdr.write(dcid.length); hdr.write(dcid)
    hdr.write(1); hdr.write(0xCC)
    hdr.write(0)                                      // empty token
    hdr.write(QI.encodeVarint(1L + frames.length + 16))
    val pnOffset = hdr.size()
    hdr.write(5)
    val aad = hdr.toByteArray
    val ct = QI.gcmSeal(key, iv, 5L, aad, frames)
    val pkt = aad ++ ct
    val mask = QI.hpMask(hp,
      java.util.Arrays.copyOfRange(pkt, pnOffset + 4, pnOffset + 20))
    pkt(0) = (pkt(0) ^ (mask(0) & 0x0F)).toByte
    pkt(pnOffset) = (pkt(pnOffset) ^ mask(1)).toByte
    assert(QI.open(pkt) == null)
  }

  test("truncations of a valid packet never parse and never throw") {
    val frames = QI.cryptoFrame(0L, PcapSynth.tlsClientHello(5).drop(5)) ++
      new Array[Byte](1200)
    val pkt = QI.seal(QI.V1, QI.hex("cafebabe01020304"), QI.hex("dd"),
      QI.hex("0011223344556677"), 9L, 2, frames)
    for (n <- 0 until pkt.length by 37)
      assert(QI.open(java.util.Arrays.copyOf(pkt, n)) == null)
  }

  test("fuzz: deterministic pseudo-random datagrams never throw") {
    var x = 0x12345678L
    def nx(): Int = { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 33).toInt }
    for (trial <- 0 until 300) {
      val len = 1 + math.abs(nx()) % 1500
      val b = Array.tabulate[Byte](len)(_ => nx().toByte)
      if (trial % 3 == 0) { b(0) = (b(0) | 0xC0).toByte; b(1) = 0; b(2) = 0; b(3) = 0; b(4) = 1 }
      QI.open(b)                                      // must not throw
    }
  }

  // ----- the expression end-to-end --------------------------------------

  test("QuicParse recovers SNI/ALPN/fp from a sealed Initial, rejects garbage") {
    val row = graft.functions.QuicParse.parse(PcapSynth.quicInitialDatagram(13))
    assert(row != null)
    val f = 13 % 24
    assert(row.getString(0) == (if (13 % 3 == 2) "v2" else "v1"))
    assert(row.getString(5) == f"host$f%03d.example.org")  // f=13, 13%3=1
    assert(row.getString(6) == "TLS1.3")                   // odd f
    assert(row.getInt(7) == 8 + f % 5)
    assert(row.getString(8) == "http/1.1")
    assert(graft.functions.QuicParse.parse(Array[Byte](1, 2, 3)) == null)
  }

  test("independent Python decryptor opens the whole fixture (library HKDF/AES)") {
    val p = java.nio.file.Paths.get("/tmp/graft_synth_quic_sni.pcap")
    PcapSynth.ensureQuicInitialFile(p, 96)
    val out = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3",
      "/root/repo/tools/quic_oracle.py", p.toString, "96"))
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(code == 0 && out.toString.contains("QUIC_ORACLE PASS"),
      s"python decryptor rejected the fixture: $out")
  }
}
