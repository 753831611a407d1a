package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `quic_initial(payload)` — decrypt a QUIC client Initial datagram
  * (RFC 9001/9369 initial protection, [[graft.pcap.QuicInitial]]) and
  * surface what a passive tap can recover from it:
  *
  *   version STRING      "v1" | "v2"
  *   dcid STRING         destination connection id, lowercase hex
  *   scid STRING         source connection id, lowercase hex
  *   token_len INT       retry/NEW_TOKEN token length (0 = none)
  *   pkt_num BIGINT      unprotected packet number
  *   sni STRING          ClientHello server_name (null if absent or the
  *                       CRYPTO stream is incomplete in this datagram)
  *   tls_version STRING  as [[TlsParse]] ("TLS1.3" via supported_versions)
  *   cipher_count INT    offered suites (null when no complete CH)
  *   alpn STRING         first ALPN protocol
  *   fp STRING           JA3-style client fingerprint ([[TlsParse.fingerprint]])
  *
  * NULL (never throws) for anything that is not an authenticatable
  * client Initial: short-header packets, version negotiation, retry,
  * unknown versions, truncated headers, bit-flipped ciphertext (GCM tag
  * failure). The TLS sub-struct is null-but-row-present when decryption
  * succeeds but the ClientHello spans datagrams — the header fields are
  * still real telemetry then. Native expression with `doGenCode`, same
  * discipline as [[TlsClientHelloExpr]].
  */
case class QuicInitialExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = QuicParse.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quic_initial expects BINARY, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    QuicParse.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val row = ctx.freshName("quicRow")
      s"""
        org.apache.spark.sql.catalyst.InternalRow $row =
          graft.functions.QuicParse.parse($c);
        if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): QuicInitialExpr =
    copy(child = newChild)
  override def prettyName: String = "quic_initial"
}

object QuicInitialExpr {
  def quic_initial(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(QuicInitialExpr(GraftSqlBridge.expression(c)))
  }
}

object QuicParse {
  val schema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("dcid", StringType),
    StructField("scid", StringType),
    StructField("token_len", IntegerType),
    StructField("pkt_num", LongType),
    StructField("sni", StringType),
    StructField("tls_version", StringType),
    StructField("cipher_count", IntegerType),
    StructField("alpn", StringType),
    StructField("fp", StringType)))

  def parse(b: Array[Byte]): InternalRow = {
    val o = graft.pcap.QuicInitial.open(b)
    if (o == null) return null
    // the CRYPTO stream is the handshake message WITHOUT the TLS record
    // layer (RFC 9001 §4.1.3); re-frame it so TlsParse applies unchanged.
    // Trim to the declared ClientHello length first — Initial CRYPTO may
    // be followed by more handshake bytes in later packets, and TlsParse
    // requires the body to fill the record exactly.
    var tls: InternalRow = null
    val c = o.crypto
    if (c != null && c.length >= 4 && (c(0) & 0xFF) == 0x01) {
      val hsLen = ((c(1) & 0xFF) << 16) | ((c(2) & 0xFF) << 8) | (c(3) & 0xFF)
      if (4 + hsLen <= c.length && 4 + hsLen <= 0xFFFB) {
        val rec = new Array[Byte](5 + 4 + hsLen)
        rec(0) = 0x16; rec(1) = 3; rec(2) = 1
        rec(3) = (((4 + hsLen) >> 8) & 0xFF).toByte
        rec(4) = ((4 + hsLen) & 0xFF).toByte
        System.arraycopy(c, 0, rec, 5, 4 + hsLen)
        tls = TlsParse.parse(rec)
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(if (o.version == graft.pcap.QuicInitial.V2) "v2" else "v1"),
      UTF8String.fromString(graft.pcap.QuicInitial.toHex(o.dcid)),
      UTF8String.fromString(graft.pcap.QuicInitial.toHex(o.scid)),
      o.tokenLen,
      o.pktNum,
      if (tls == null) null else tls.get(0, StringType),
      if (tls == null) null else tls.get(1, StringType),
      if (tls == null) null else tls.get(2, IntegerType),
      if (tls == null) null else tls.get(3, StringType),
      if (tls == null) null else tls.get(4, StringType)))
  }
}
