package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst `Expression` —
  * text-cleaning primitive for the LLM-pipeline operators (SURVEY.md
  * §2C): web crawls mix precomposed and combining-mark renderings of
  * the same text, so every digest-keyed operator upstream (exact
  * dedup, chunk dedup, fingerprints) silently treats canonically-equal
  * documents as distinct unless ingestion normalizes first. Spark has
  * no normalization built-in; the JDK's `java.text.Normalizer` is the
  * reference implementation of UAX #15 and needs no model/data files,
  * so the expression is a thin codegen'd wrapper around it (same
  * native-Expression discipline as [[RollingHash]] — no UDF
  * serialization, stays inside whole-stage codegen; the per-row work
  * dominates, the call overhead does not).
  *
  * The fast path skips allocation entirely: `Normalizer.isNormalized`
  * is O(n) with no copy, and real corpora are overwhelmingly already
  * NFC — only the rare denormalized row pays for `normalize`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.norm($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** NFC-normalize one UTF8String; returns the INPUT OBJECT unchanged
    * (no copy) when already normalized. */
  def norm(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point (classic-mode bridge, as RollingHash). */
  def nfc_normalize(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(c)))
  }
}
