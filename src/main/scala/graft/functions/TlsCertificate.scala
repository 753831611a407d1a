package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Clean-room passive X.509 leaf-certificate extraction from a
  * reassembled TLS 1.2 server flight (RFC 5246 §7.4.2 wire layout for
  * the Certificate handshake message, RFC 5280 DER for the certificate
  * itself; the reference decodes no TLS at all — this is L7 surface the
  * reassembled `stream` column unlocks). Input: the server→client TCP
  * stream prefix starting at the first TLS record (ServerHello,
  * Certificate, … — the pre-encryption flight, which TLS 1.2 sends in
  * the clear). Output: the fields a passive certificate inventory
  * groups by —
  *
  *   serial BIGINT        certificate serialNumber (low 63 bits)
  *   subject_cn STRING    subject commonName (null if absent)
  *   issuer_cn STRING     issuer commonName (null if absent)
  *   not_before BIGINT    validity start, epoch seconds (UTC)
  *   not_after BIGINT     validity end, epoch seconds (UTC)
  *   san_count INT        dNSName entries in subjectAltName (0 if none)
  *   self_signed BOOLEAN  issuer Name DER == subject Name DER
  *
  * Only the FIRST (leaf) certificate of the chain is parsed — the
  * inventory question is "what is this server presenting", not "who
  * signed it" (the issuer CN answers that enough for a rollup).
  *
  * Returns NULL (never throws) for anything that is not a well-formed
  * flight carrying a complete Certificate message — random payloads,
  * truncated records, encrypted TLS 1.3 flights (whose Certificate is
  * inside encrypted records and correctly yields NULL). Every length is
  * bounds-checked against both its container and the buffer end; the
  * handshake coalescing buffer is capped (a lying record length cannot
  * allocate unbounded memory). TlsCertSpec fuzzes all of this.
  *
  * A native Catalyst `Expression` with `doGenCode` (the static `parse`
  * call stays inside whole-stage codegen; no UDF boxing per row).
  */
case class TlsCertificateExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TlsCertParse.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tls_certificate expects BINARY, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TlsCertParse.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val row = ctx.freshName("tlsCertRow")
      s"""
        org.apache.spark.sql.catalyst.InternalRow $row =
          graft.functions.TlsCertParse.parse($c);
        if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): TlsCertificateExpr =
    copy(child = newChild)
  override def prettyName: String = "tls_certificate"
}

object TlsCertificateExpr {
  def tls_certificate(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(TlsCertificateExpr(GraftSqlBridge.expression(c)))
  }
}

object TlsCertParse {
  val schema: StructType = StructType(Seq(
    StructField("serial", LongType),
    StructField("subject_cn", StringType),
    StructField("issuer_cn", StringType),
    StructField("not_before", LongType),
    StructField("not_after", LongType),
    StructField("san_count", IntegerType),
    StructField("self_signed", BooleanType)))

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Handshake-coalescing cap: a leaf chain larger than this is not an
    * inventory target (RFC 5246 allows 2^24-1, real chains are < 64 KiB;
    * the cap bounds what a lying record length can make us buffer). */
  private val MaxHandshake = 1 << 20

  @inline private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  @inline private def u24(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 16) | ((b(i + 1) & 0xFF) << 8) | (b(i + 2) & 0xFF)

  /** Null on any malformation (the TlsParse discipline). */
  def parse(b: Array[Byte]): InternalRow = {
    try {
      val hs = coalesceHandshake(b)
      if (hs == null) return null
      // walk handshake messages for type 11 (Certificate)
      var q = 0
      while (q + 4 <= hs.length) {
        val msgType = hs(q) & 0xFF
        val msgLen = u24(hs, q + 1)
        val bodyAt = q + 4
        if (bodyAt + msgLen > hs.length) return null
        if (msgType == 11) {
          if (msgLen < 6) return null
          val listLen = u24(hs, bodyAt)
          if (3 + listLen != msgLen) return null
          val certLen = u24(hs, bodyAt + 3)
          if (certLen <= 0 || bodyAt + 6 + certLen > bodyAt + msgLen)
            return null
          return parseCert(hs, bodyAt + 6, bodyAt + 6 + certLen)
        }
        q = bodyAt + msgLen
      }
      null
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  /** Concatenate the payloads of the leading run of handshake (type 22)
    * TLS records; null if the buffer does not start with one or a
    * record header lies about its length. Stops cleanly at the first
    * non-handshake record (e.g. ChangeCipherSpec) — everything the
    * Certificate message could span is before it. */
  private def coalesceHandshake(b: Array[Byte]): Array[Byte] = {
    if (b.length < 5 || (b(0) & 0xFF) != 0x16 || b(1) != 3) return null
    val out = new java.io.ByteArrayOutputStream()
    var p = 0
    while (p + 5 <= b.length && (b(p) & 0xFF) == 0x16 && b(p + 1) == 3) {
      val rl = u16(b, p + 3)
      if (p + 5 + rl > b.length) {
        // truncated final record: a Certificate message already fully
        // inside previous records is still parseable; keep what we have
        return if (out.size() == 0) null else out.toByteArray
      }
      if (out.size() + rl > MaxHandshake) return null
      out.write(b, p + 5, rl)
      p += 5 + rl
    }
    if (out.size() == 0) null else out.toByteArray
  }

  // ----- minimal DER reader (bounds-checked, definite lengths only) ----

  /** Decode tag+length at `p` inside [p, end); returns
    * (contentStart, contentEnd, tag) or null. Indefinite and >3-byte
    * lengths are malformed for DER certificates. */
  private def tlv(b: Array[Byte], p: Int, end: Int): (Int, Int, Int) = {
    if (p + 2 > end) return null
    val tag = b(p) & 0xFF
    var q = p + 1
    var len = b(q) & 0xFF
    q += 1
    if (len >= 0x80) {
      val n = len & 0x7F
      if (n < 1 || n > 3 || q + n > end) return null
      len = 0
      var i = 0
      while (i < n) { len = (len << 8) | (b(q + i) & 0xFF); i += 1 }
      q += n
    }
    if (len < 0 || q + len > end) return null
    (q, q + len, tag)
  }

  /** The commonName inside an RDNSequence Name: walk SETs of
    * AttributeTypeAndValue for OID 2.5.4.3 (55 04 03). */
  private def cnOf(b: Array[Byte], from: Int, to: Int): String = {
    var p = from
    while (p < to) {
      val set = tlv(b, p, to)
      if (set == null) return null
      if (set._3 == 0x31) {
        var q = set._1
        while (q < set._2) {
          val atv = tlv(b, q, set._2)
          if (atv == null) return null
          if (atv._3 == 0x30) {
            val oid = tlv(b, atv._1, atv._2)
            if (oid != null && oid._3 == 0x06 && oid._2 - oid._1 == 3 &&
                b(oid._1) == 0x55 && b(oid._1 + 1) == 0x04 &&
                b(oid._1 + 2) == 0x03) {
              val v = tlv(b, oid._2, atv._2)
              // UTF8String / PrintableString / IA5String
              if (v != null && (v._3 == 0x0C || v._3 == 0x13 || v._3 == 0x16))
                return new String(b, v._1, v._2 - v._1, Ascii)
            }
          }
          q = atv._2
        }
      }
      p = set._2
    }
    null
  }

  /** UTCTime (YYMMDDHHMMSSZ, RFC 5280 §4.1.2.5.1 pivot 50) or
    * GeneralizedTime (YYYYMMDDHHMMSSZ) → epoch seconds; Long.MinValue
    * on malformation. */
  private def timeOf(b: Array[Byte], t: (Int, Int, Int)): Long = {
    val s = new String(b, t._1, t._2 - t._1, Ascii)
    val (digits, year) =
      if (t._3 == 0x17 && s.length == 13 && s.last == 'Z') {
        val yy = s.substring(0, 2).toInt
        (s.substring(2, 12), if (yy < 50) 2000 + yy else 1900 + yy)
      } else if (t._3 == 0x18 && s.length == 15 && s.last == 'Z')
        (s.substring(4, 14), s.substring(0, 4).toInt)
      else return Long.MinValue
    if (!digits.forall(_.isDigit)) return Long.MinValue
    try {
      java.time.LocalDateTime.of(year,
        digits.substring(0, 2).toInt, digits.substring(2, 4).toInt,
        digits.substring(4, 6).toInt, digits.substring(6, 8).toInt,
        digits.substring(8, 10).toInt)
        .toEpochSecond(java.time.ZoneOffset.UTC)
    } catch { case _: java.time.DateTimeException => Long.MinValue }
  }

  /** dNSName (context tag 2) entries in a subjectAltName extension
    * value (the OCTET STRING content: SEQUENCE OF GeneralName). */
  private def sanCount(b: Array[Byte], from: Int, to: Int): Int = {
    val seq = tlv(b, from, to)
    if (seq == null || seq._3 != 0x30) return -1
    var n = 0
    var p = seq._1
    while (p < seq._2) {
      val gn = tlv(b, p, seq._2)
      if (gn == null) return -1
      if (gn._3 == 0x82) n += 1
      p = gn._2
    }
    n
  }

  /** Parse one DER certificate in [from, to). */
  private def parseCert(b: Array[Byte], from: Int, to: Int): InternalRow = {
    val cert = tlv(b, from, to)
    if (cert == null || cert._3 != 0x30) return null
    val tbs = tlv(b, cert._1, cert._2)
    if (tbs == null || tbs._3 != 0x30) return null
    var p = tbs._1
    val end = tbs._2
    // optional [0] EXPLICIT version
    val first = tlv(b, p, end)
    if (first == null) return null
    if (first._3 == 0xA0) p = first._2
    // serialNumber INTEGER (low 63 bits of the trailing 8 bytes)
    val ser = tlv(b, p, end)
    if (ser == null || ser._3 != 0x02 || ser._2 - ser._1 < 1) return null
    var serial = 0L
    var i = math.max(ser._1, ser._2 - 8)
    while (i < ser._2) { serial = (serial << 8) | (b(i) & 0xFF); i += 1 }
    serial &= Long.MaxValue
    p = ser._2
    // signature AlgorithmIdentifier (skip)
    val sigAlg = tlv(b, p, end)
    if (sigAlg == null || sigAlg._3 != 0x30) return null
    p = sigAlg._2
    // issuer Name
    val issuer = tlv(b, p, end)
    if (issuer == null || issuer._3 != 0x30) return null
    val issuerCn = cnOf(b, issuer._1, issuer._2)
    p = issuer._2
    // validity
    val validity = tlv(b, p, end)
    if (validity == null || validity._3 != 0x30) return null
    val nb = tlv(b, validity._1, validity._2)
    if (nb == null) return null
    val na = tlv(b, nb._2, validity._2)
    if (na == null) return null
    val notBefore = timeOf(b, nb)
    val notAfter = timeOf(b, na)
    if (notBefore == Long.MinValue || notAfter == Long.MinValue) return null
    p = validity._2
    // subject Name
    val subject = tlv(b, p, end)
    if (subject == null || subject._3 != 0x30) return null
    val subjectCn = cnOf(b, subject._1, subject._2)
    val selfSigned = (issuer._2 - issuer._1 == subject._2 - subject._1) &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(b, issuer._1, issuer._2),
        java.util.Arrays.copyOfRange(b, subject._1, subject._2))
    p = subject._2
    // subjectPublicKeyInfo (skip)
    val spki = tlv(b, p, end)
    if (spki == null || spki._3 != 0x30) return null
    p = spki._2
    // optional [1]/[2] unique ids, then [3] extensions
    var san = 0
    while (p < end) {
      val t = tlv(b, p, end)
      if (t == null) return null
      if (t._3 == 0xA3) {
        val extSeq = tlv(b, t._1, t._2)
        if (extSeq == null || extSeq._3 != 0x30) return null
        var q = extSeq._1
        while (q < extSeq._2) {
          val ext = tlv(b, q, extSeq._2)
          if (ext == null) return null
          if (ext._3 == 0x30) {
            val oid = tlv(b, ext._1, ext._2)
            if (oid != null && oid._3 == 0x06 && oid._2 - oid._1 == 3 &&
                b(oid._1) == 0x55 && b(oid._1 + 1) == 0x1D &&
                b(oid._1 + 2) == 0x11) {
              // skip the optional critical BOOLEAN before the value
              var v = tlv(b, oid._2, ext._2)
              if (v != null && v._3 == 0x01) v = tlv(b, v._2, ext._2)
              if (v != null && v._3 == 0x04) {
                val c = sanCount(b, v._1, v._2)
                if (c >= 0) san = c
              }
            }
          }
          q = ext._2
        }
      }
      p = t._2
    }
    new GenericInternalRow(Array[Any](
      serial,
      if (subjectCn == null) null else UTF8String.fromString(subjectCn),
      if (issuerCn == null) null else UTF8String.fromString(issuerCn),
      notBefore,
      notAfter,
      san,
      selfSigned))
  }
}
