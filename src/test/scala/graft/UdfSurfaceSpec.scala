package graft

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The user-extension surface (SURVEY.md §2B "UDF/UDAF/UDTF"): standard
  * `spark.udf.register` scalar UDFs, a typed `Aggregator[IN,BUF,OUT]`, and
  * the native expressions (RollingHash / SimHashAgg) registered for SQL. */
class UdfSurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("scalar UDF registration + SQL use") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    spark.udf.register("shannon_entropy", (s: String) => {
      if (s == null || s.isEmpty) 0.0
      else {
        val counts = s.groupBy(identity).view.mapValues(_.length.toDouble)
        val n = s.length.toDouble
        -counts.values.map(c => (c / n) * math.log(c / n) / math.log(2)).sum
      }
    })
    val rows = spark.sql(
      """SELECT doc_id, shannon_entropy(text) AS ent FROM documents
         WHERE doc_id < 5 ORDER BY doc_id""").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getDouble(1) > 0.0))
  }

  /** typed weighted-mean aggregator */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) 0.0 else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  test("typed Aggregator: quantity-weighted mean price") {
    import spark.implicits._
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_extendedprice".as[Double], $"l_quantity".as[Double])
      .as[(Double, Double)]
    val got = li.select(WeightedMean.toColumn).head()
    // cross-check against untyped computation
    val expect = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .agg((sum($"l_extendedprice" * $"l_quantity") / sum($"l_quantity")))
      .head().getDouble(0)
    assert(math.abs(got - expect) / expect < 1e-9)
  }

  test("native expressions registered for SQL use") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash",
      exprs => graft.functions.RollingHash(exprs.head), "scala_udf")
    val viaSql = spark.sql(
      "SELECT rolling_hash(text) AS h FROM documents WHERE doc_id = 0")
      .head().getLong(0)
    val direct = graft.functions.RollingHash.hash(
      Tables.documents(spark, "/root/testdata/sf0.001")
        .filter("doc_id = 0").head().getAs[String]("text"))
    assert(viaSql == direct)
  }

  test("reference parity UDFs: protocol_name / ipv6_ext_name / to_hex_upper") {
    graft.functions.ParityFunctions.register(spark)
    val r = spark.sql(
      """SELECT protocol_name(17), protocol_name(99),
         ipv6_ext_name(44), to_hex_upper(CAST('AB' AS BINARY))""").head()
    assert(r.getString(0) == "UDP")
    assert(r.getString(1) == "99") // unknown id -> numeric string (parity)
    assert(r.getString(2) == "Fragment")
    assert(r.getString(3) == "4142")
  }

  test("brotli_decode: SQL registration, dictionary-referencing " +
      "round-trip, NULL on out-of-scope, error on corrupt") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "brotli_decode",
      exprs => graft.functions.BrotliDecode(exprs.head), "scala_udf")
    import spark.implicits._
    val blob = graft.operators.BrotliCodec
      .encodeWithDictPrefix("hello".getBytes("UTF-8"))
    val got = Seq(Tuple1(blob)).toDF("b")
      .selectExpr("CAST(brotli_decode(b) AS STRING) AS s").head().getString(0)
    assert(got == "Time hello")
    // large-window header (valid, out of scope) -> NULL, not a task kill
    val lw = Seq(Tuple1(Array[Byte](0x11, 0x22))).toDF("b")
      .selectExpr("brotli_decode(b) AS d").head()
    assert(lw.isNullAt(0))
    // corrupt bytes still error (silent nulls would hide corruption)
    intercept[Exception] {
      Seq(Tuple1(Array[Byte](0x21, 0x7F, 0x7F, 0x7F))).toDF("b")
        .selectExpr("brotli_decode(b)").collect()
    }
  }
}
