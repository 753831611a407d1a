package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** `brotli_decode(binary) -> binary` as a native Catalyst
  * `Expression` — the full clean-room RFC 7932 decoder
  * ([[graft.operators.BrotliCodec]], static dictionary + all context
  * modes) at the SQL surface, for corpora that store brotli blobs in
  * COLUMNS rather than behind a Content-Encoding header (compressed
  * document lakes, API capture dumps). Same native-Expression
  * discipline as [[NfcNormalize]]/[[RollingHash]]: no UDF
  * serialization, stays inside whole-stage codegen.
  *
  * Semantics mirror the warc walk's scale rule: valid-but-out-of-scope
  * streams ([[graft.operators.BrotliCodec.Unsupported]] — large-window
  * extension, bomb-cap breach) return NULL so one odd blob routes
  * instead of failing the task; CORRUPT bytes still throw (silent
  * nulls there would hide data corruption). The 256 MiB per-value cap
  * bounds executor memory however hostile the input. */
case class BrotliDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"brotli_decode expects BINARY, got ${child.dataType.catalogString}")

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BrotliDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BrotliDecode.decode($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): BrotliDecode =
    copy(child = newChild)
  override def prettyName: String = "brotli_decode"
}

object BrotliDecode {

  private val MaxOut = 256L << 20

  def decode(in: Array[Byte]): Array[Byte] =
    try graft.operators.BrotliCodec.decode(in, MaxOut)
    catch { case _: graft.operators.BrotliCodec.Unsupported => null }

  /** Column-API entry point (classic-mode bridge, as RollingHash). */
  def brotli_decode(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(BrotliDecode(GraftSqlBridge.expression(c)))
  }
}
