package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` entry point: registers the engine's native
  * functions for SQL use session-wide.
  *
  * Usage: `--conf spark.sql.extensions=graft.GraftExtensions`, or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * Kept deliberately small (SURVEY.md §4: no planner rules or strategies
  * are needed for this engine — DSv2 + built-ins cover the plan space);
  * the extension surface is function registration only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash",
        "rolling_hash(str) - Rabin-Karp polynomial hash of the string"),
      (exprs: Seq[Expression]) => functions.RollingHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot",
        "vec_dot(a, b) - sequential-fold double dot product of numeric arrays"),
      (exprs: Seq[Expression]) =>
        functions.VecDot(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("simhash_agg"),
      info("simhash_agg",
        "simhash_agg(h) - 32-bit SimHash of a group of token hashes"),
      (exprs: Seq[Expression]) =>
        functions.SimHashAgg(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(str) - Unicode NFC normalization (UAX #15)"),
      (exprs: Seq[Expression]) => functions.NfcNormalize(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("brotli_decode"),
      info("brotli_decode",
        "brotli_decode(bin) - full RFC 7932 decode (static dictionary " +
          "included); NULL for valid-but-out-of-scope streams, error " +
          "on corrupt bytes"),
      (exprs: Seq[Expression]) => functions.BrotliDecode(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("tls_client_hello"),
      info("tls_client_hello",
        "tls_client_hello(bin) - parse a TLS ClientHello payload to a " +
          "struct(sni, version, cipher_count, alpn); NULL if malformed"),
      (exprs: Seq[Expression]) =>
        functions.TlsClientHelloExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("tls_server_hello"),
      info("tls_server_hello",
        "tls_server_hello(bin) - parse a TLS ServerHello payload to a " +
          "struct(version, cipher, alpn, fp); NULL if malformed"),
      (exprs: Seq[Expression]) =>
        functions.TlsServerHelloExpr(exprs.head)))
  }
}
