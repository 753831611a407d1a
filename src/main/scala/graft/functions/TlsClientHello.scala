package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Clean-room TLS ClientHello field extraction (RFC 8446 §4.1.2 wire
  * layout; the reference decodes no TLS at all — this is L7 surface the
  * `tcp_flags`/payload columns unlock). Input: the raw TCP payload of a
  * packet (or reassembled stream prefix) that starts with a TLS handshake
  * record. Output: a struct of the fields SOC/telemetry queries group by
  *
  *   sni STRING            server_name extension host (null if absent)
  *   version STRING        "TLS1.3" when supported_versions carries
  *                         0x0304, else the legacy client_version name
  *   cipher_count INT      offered cipher-suite count
  *   alpn STRING           first ALPN protocol (null if absent)
  *   fp STRING             md5 hex of the canonical client fingerprint
  *                         string "legacy_version,cipher-...,exttype-..."
  *                         (decimal, offer order) — the JA3-style
  *                         client-stack identifier SOC pipelines group by
  *
  * Returns NULL (never throws) for anything that is not a complete,
  * well-formed ClientHello prefix — random payloads, truncated records,
  * mid-stream segments (TlsParseSpec fuzzes this). Every length field is
  * bounds-checked against both the record end and the buffer end.
  *
  * A native Catalyst `Expression` with `doGenCode` (the static `parse`
  * call stays inside whole-stage codegen; no UDF boxing per row).
  */
case class TlsClientHelloExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TlsParse.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tls_client_hello expects BINARY, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TlsParse.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val row = ctx.freshName("tlsRow")
      s"""
        org.apache.spark.sql.catalyst.InternalRow $row =
          graft.functions.TlsParse.parse($c);
        if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): TlsClientHelloExpr =
    copy(child = newChild)
  override def prettyName: String = "tls_client_hello"
}

object TlsClientHelloExpr {
  def tls_client_hello(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(TlsClientHelloExpr(GraftSqlBridge.expression(c)))
  }
}

/** Clean-room TLS ServerHello extraction (RFC 8446 §4.1.3) — the
  * SERVER-side twin of [[TlsClientHelloExpr]]: which stack answered,
  * what it selected. Output struct:
  *
  *   version STRING   "TLS1.3" when the supported_versions extension
  *                    carries selected 0x0304 (in a ServerHello the
  *                    extension body IS one 2-byte version, not a
  *                    list), else the legacy version name
  *   cipher INT       the single selected cipher suite
  *   alpn STRING      the selected ALPN protocol (null if absent)
  *   fp STRING        md5 hex of "legacy_version,cipher,ext-..." — the
  *                    JA3S-style server-stack identifier (same
  *                    canonical form as the client fingerprint with a
  *                    one-element cipher list)
  *
  * NULL (never throws) for anything not a complete well-formed
  * ServerHello prefix; every length bounds-checked (TcpFlagsTlsSpec
  * fuzzes). Native expression with `doGenCode`, as the client twin. */
case class TlsServerHelloExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TlsServerParse.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tls_server_hello expects BINARY, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TlsServerParse.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val row = ctx.freshName("tlsSrvRow")
      s"""
        org.apache.spark.sql.catalyst.InternalRow $row =
          graft.functions.TlsServerParse.parse($c);
        if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): TlsServerHelloExpr =
    copy(child = newChild)
  override def prettyName: String = "tls_server_hello"
}

object TlsServerHelloExpr {
  def tls_server_hello(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(TlsServerHelloExpr(GraftSqlBridge.expression(c)))
  }
}

object TlsServerParse {
  val schema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("cipher", IntegerType),
    StructField("alpn", StringType),
    StructField("fp", StringType)))

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  @inline private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  /** Null on any malformation (same discipline as [[TlsParse.parse]]:
    * the record/handshake/extension lengths must all agree exactly). */
  def parse(b: Array[Byte]): InternalRow = {
    try {
      if (b.length < 9 || (b(0) & 0xFF) != 0x16 || b(1) != 3) return null
      val end = 5 + u16(b, 3)
      if (b.length < end) return null
      if ((b(5) & 0xFF) != 0x02) return null   // handshake type 2
      val hsLen = ((b(6) & 0xFF) << 16) | ((b(7) & 0xFF) << 8) | (b(8) & 0xFF)
      if (9 + hsLen != end) return null
      var p = 9
      if (p + 35 > end) return null
      val legacy = u16(b, p)
      p += 34                                  // version + 32-byte random
      val sidLen = b(p) & 0xFF
      p += 1 + sidLen
      if (p + 3 > end) return null
      val cipher = u16(b, p)                   // ONE selected suite
      p += 2
      p += 1                                   // compression method
      var alpn: String = null
      var v13 = false
      val extTypes = scala.collection.mutable.ArrayBuffer[Int]()
      if (p + 2 <= end) {
        val extEnd = p + 2 + u16(b, p)
        if (extEnd != end) return null
        p += 2
        while (p + 4 <= extEnd) {
          val extType = u16(b, p)
          val extLen = u16(b, p + 2)
          p += 4
          val ee = p + extLen
          if (ee > extEnd) return null
          extTypes += extType
          extType match {
            case 16 =>                         // ALPN: the selected protocol
              if (extLen >= 3) {
                val alpnLen = b(p + 2) & 0xFF
                if (p + 3 + alpnLen <= ee)
                  alpn = new String(b, p + 3, alpnLen, Ascii)
              }
            case 43 =>                         // supported_versions: ONE version
              if (extLen == 2 && u16(b, p) == 0x0304) v13 = true
            case _ => ()
          }
          p = ee
        }
      } else if (p != end) return null         // stray trailing byte(s)
      val version =
        if (v13) "TLS1.3"
        else legacy match {
          case 0x0304 => "TLS1.3"
          case 0x0303 => "TLS1.2"
          case 0x0302 => "TLS1.1"
          case 0x0301 => "TLS1.0"
          case 0x0300 => "SSL3"
          case other => f"0x$other%04X"
        }
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(version),
        cipher,
        if (alpn == null) null else UTF8String.fromString(alpn),
        UTF8String.fromString(
          TlsParse.fingerprint(legacy, Array(cipher), extTypes.toArray))))
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }
}

object TlsParse {
  val schema: StructType = StructType(Seq(
    StructField("sni", StringType),
    StructField("version", StringType),
    StructField("cipher_count", IntegerType),
    StructField("alpn", StringType),
    StructField("fp", StringType)))

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  @inline private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  // MessageDigest is reusable (digest() resets) but not thread-safe;
  // per-thread reuse keeps the per-row cost at a hash, not a JCA lookup
  // + allocation inside the codegen'd hot path
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue() =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Canonical client-stack fingerprint: md5 hex (lowercase) of
    * "legacy_version,c1-c2-…,e1-e2-…" with decimal fields in offer
    * order — stable across SNI/hosts, distinct across client stacks. */
  def fingerprint(legacy: Int, ciphers: Array[Int],
      extTypes: Array[Int]): String = {
    val canon = s"$legacy,${ciphers.mkString("-")},${extTypes.mkString("-")}"
    md5Local.get().digest(canon.getBytes(Ascii))
      .map(b => f"${b & 0xFF}%02x").mkString
  }

  /** Null on any malformation; the catch is belt-and-braces (every read
    * below is bounds-checked first — fuzz keeps it honest). */
  def parse(b: Array[Byte]): InternalRow = {
    try {
      // record header: type 22 (handshake), major version 3, length.
      // The WHOLE declared record must be present — parsing a truncated
      // buffer could emit a row with the tail extensions missing (wrong
      // version/fingerprint) instead of the documented NULL
      if (b.length < 9 || (b(0) & 0xFF) != 0x16 || b(1) != 3) return null
      val end = 5 + u16(b, 3)
      if (b.length < end) return null
      // handshake header: type 1 (ClientHello) + 24-bit length. The
      // handshake body must fill the record exactly — a shorter body
      // (e.g. coalesced handshake messages in one record) would otherwise
      // leak the NEXT message's bytes into the extension walk and yield a
      // wrong version/fingerprint instead of the documented NULL
      if ((b(5) & 0xFF) != 0x01) return null
      val hsLen = ((b(6) & 0xFF) << 16) | ((b(7) & 0xFF) << 8) | (b(8) & 0xFF)
      if (9 + hsLen != end) return null
      var p = 9
      if (p + 35 > end) return null
      val legacy = u16(b, p)
      p += 34                                  // version + 32-byte random
      val sidLen = b(p) & 0xFF
      p += 1 + sidLen                          // legacy session id
      if (p + 2 > end) return null
      val csLen = u16(b, p)
      p += 2
      if (csLen % 2 != 0 || p + csLen > end) return null
      val cipherCount = csLen / 2
      val ciphers = new Array[Int](cipherCount)
      var ci = 0
      while (ci < cipherCount) {
        ciphers(ci) = u16(b, p + 2 * ci)
        ci += 1
      }
      p += csLen
      if (p + 1 > end) return null
      val compLen = b(p) & 0xFF
      p += 1 + compLen                         // legacy compression methods
      var sni: String = null
      var alpn: String = null
      var v13 = false
      val extTypes = scala.collection.mutable.ArrayBuffer[Int]()
      if (p + 2 <= end) {
        // the declared extensions block must agree with the record end —
        // clamping a lying length would silently parse a truncated
        // extension list, weakening the "NULL for anything not
        // well-formed" contract the fingerprint depends on
        val extEnd = p + 2 + u16(b, p)
        if (extEnd != end) return null
        p += 2
        while (p + 4 <= extEnd) {
          val extType = u16(b, p)
          val extLen = u16(b, p + 2)
          p += 4
          val ee = p + extLen
          if (ee > extEnd) return null
          extTypes += extType
          extType match {
            case 0 =>                          // server_name
              // list_len(2) name_type(1, 0 = host_name) name_len(2) name
              if (extLen >= 5 && (b(p + 2) & 0xFF) == 0) {
                val nameLen = u16(b, p + 3)
                if (p + 5 + nameLen <= ee)
                  sni = new String(b, p + 5, nameLen, Ascii)
              }
            case 16 =>                         // ALPN: first protocol wins
              if (extLen >= 3) {
                val alpnLen = b(p + 2) & 0xFF
                if (p + 3 + alpnLen <= ee)
                  alpn = new String(b, p + 3, alpnLen, Ascii)
              }
            case 43 =>                         // supported_versions
              var q = p + 1                    // skip the list-length byte
              while (q + 2 <= ee) {
                if (u16(b, q) == 0x0304) v13 = true
                q += 2
              }
            case _ => ()
          }
          p = ee
        }
      } else if (p != end) return null         // stray trailing byte(s)
      val version =
        if (v13) "TLS1.3"
        else legacy match {
          case 0x0304 => "TLS1.3"
          case 0x0303 => "TLS1.2"
          case 0x0302 => "TLS1.1"
          case 0x0301 => "TLS1.0"
          case 0x0300 => "SSL3"
          case other => f"0x$other%04X"
        }
      new GenericInternalRow(Array[Any](
        if (sni == null) null else UTF8String.fromString(sni),
        UTF8String.fromString(version),
        cipherCount,
        if (alpn == null) null else UTF8String.fromString(alpn),
        UTF8String.fromString(
          fingerprint(legacy, ciphers, extTypes.toArray))))
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }
}
