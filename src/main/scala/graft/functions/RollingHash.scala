package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Rabin-Karp) rolling hash of a string's code points:
  * `h = fold(0, c => (h * BASE + c) mod MOD)`.
  *
  * Document fingerprinting primitive for the LLM-pipeline operators
  * (builder brief; SURVEY.md §2C). Implemented as a native Catalyst
  * `Expression` with `doGenCode` so it stays inside whole-stage codegen
  * (no UDF serialization, no boxing per row) — the preferred extension
  * point per the Spark-first design rules.
  *
  * MOD = 2^31-1 keeps `h * 257 + c < 2^39` well inside a signed 64-bit
  * long, so the same arithmetic is expressible in any engine with int64
  * (the DuckDB oracle uses `list_reduce` over code points).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  import RollingHash.{BASE, MOD}

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
        String $str = $c.toString();
        long $acc = 0L;
        for (int $i = 0; $i < $str.length(); ) {
          int $cp = $str.codePointAt($i);
          $acc = ($acc * ${BASE}L + (long) $cp) % ${MOD}L;
          $i += Character.charCount($cp);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  val BASE = 257L
  val MOD = 2147483647L // 2^31 - 1

  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * BASE + cp) % MOD
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column-API entry point (Spark 4 Column wraps a ColumnNode, so go
    * through the classic-mode bridge). */
  def rolling_hash(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(c)))
  }
}
