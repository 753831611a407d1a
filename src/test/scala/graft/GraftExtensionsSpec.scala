package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** spark.sql.extensions registration path — a fresh session with
  * GraftExtensions gets the native functions in plain SQL. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions registers rolling_hash and simhash_agg for SQL") {
    // getOrCreate would silently reuse another suite's session (without
    // extensions); force a genuinely fresh one
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      Tables.registerViews(spark, "/root/testdata/sf0.001")
      val h = spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0)
      assert(h == graft.functions.RollingHash.hash("abc"))

      val dotv = spark.sql(
        "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .head().getDouble(0)
      assert(dotv == 11.0)

      val sh = spark.sql("""
        SELECT simhash_agg(CAST(conv(substr(md5(CAST(w AS BINARY)),1,8),16,10) AS BIGINT)) AS s
        FROM (SELECT explode(split(lower(text), '\\s+')) AS w
              FROM documents WHERE doc_id = 0)""").head().getLong(0)
      assert(sh != 0L)

      // nfc_normalize: decomposed a + U+0301 composes to U+00E1; the
      // already-NFC fast path returns the input unchanged
      val dec = "xa\u0301y" // Scala escape: decomposed a + combining acute
      val nfc = spark.sql(s"SELECT nfc_normalize('$dec') AS n," +
        s" length(nfc_normalize('$dec')) AS l").head()
      assert(nfc.getString(0) == "x\u00E1y" && nfc.getInt(1) == 3)
      assert(spark.sql("SELECT nfc_normalize('plain') AS n")
        .head().getString(0) == "plain")

      // tls_client_hello over a literal fixture payload, pure SQL
      val hex = graft.pcap.PcapSynth.tlsClientHello(4)
        .map(b => f"${b & 0xFF}%02X").mkString
      val tls = spark.sql(
        s"SELECT tls_client_hello(X'$hex') AS ch").select("ch.*").head()
      assert(tls.getString(0) == "host004.example.org")
      assert(tls.getString(1) == "TLS1.2")
      assert(tls.getInt(2) == 12)
      assert(tls.getString(3) == "http/1.1")
      // malformed input is NULL, not an error, in SQL too
      assert(spark.sql("SELECT tls_client_hello(X'DEAD') AS ch")
        .head().isNullAt(0))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
