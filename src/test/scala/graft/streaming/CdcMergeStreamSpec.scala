package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming CDC apply must resolve EXACTLY the batch twin's
  * snapshot (`pipeline_merge_upsert` — itself DuckDB-oracled), with
  * the deliveries admitted in REVERSE order across micro-batches
  * (arrival-order independence of the argmax fold), and must hold
  * exactly-once across a checkpoint restart that lands mid-history. */
class CdcMergeStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val fixtureTs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val flushTs = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")

  /** Land one delivery (all changelog rows of `version`) as a
    * single-file parquet slice under `dir`/`name`. All fixture rows
    * share one event time — versions, not clocks, order the merge. */
  private def landDelivery(dir: java.nio.file.Path, name: String,
      version: Long): Unit = {
    import spark.implicits._
    val rows = graft.operators.Pipeline.changeLog(spark, sf)
      .filter(s"version = $version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) null else r.getString(3), fixtureTs))
    rows.toSeq.toDF("doc_id", "version", "del", "h", "time")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve(name).toString)
  }

  /** A sacrificial far-future tombstone for key -1: advances the
    * watermark past every fixture key's idle horizon (firing their
    * timeouts) and can never emit anything itself. */
  private def landFlush(dir: java.nio.file.Path, name: String): Unit = {
    import spark.implicits._
    Seq((-1L, 0L, true, null: String, flushTs))
      .toDF("doc_id", "version", "del", "h", "time")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve(name).toString)
  }

  private def changeStream(dir: java.nio.file.Path) =
    CdcMergeStream.snapshot(
      spark.readStream
        .schema("doc_id LONG, version LONG, del BOOLEAN, h STRING, " +
          "time TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString + "/d*"))

  private def twinRows(): Set[(Long, Long, String)] =
    graft.SparkEntry.queries("pipeline_merge_upsert")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("reverse-order delivery admission resolves to the batch twin " +
      "exactly") {
    val dir = Files.createTempDirectory("cdc_land")
    // deliveries land NEWEST FIRST: d1=v3, d2=v2, d3=v1 (dir glob
    // admits lexicographically; one file per trigger)
    landDelivery(dir, "d1", 3L)
    landDelivery(dir, "d2", 2L)
    landDelivery(dir, "d3", 1L)
    landFlush(dir, "d9_flush")
    val query = changeStream(dir)
      .writeStream.format("memory").queryName("cdc1")
      .option("checkpointLocation",
        Files.createTempDirectory("cdc_ckpt").toString)
      .outputMode("append").start()
    try query.processAllAvailable() finally query.stop()
    val got = spark.sql("SELECT * FROM cdc1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = twinRows()
    assert(got == want,
      s"stream/batch divergence: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
  }

  test("checkpoint restart mid-history neither loses nor duplicates " +
      "snapshot rows (exactly-once)") {
    val dir = Files.createTempDirectory("cdc_restart_land")
    val ckpt = Files.createTempDirectory("cdc_restart_ckpt")
    val out = Files.createTempDirectory("cdc_restart_out")
    def start() = changeStream(dir).writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    // first instance sees v3 and v2 only, then dies — every key's
    // winner is still provisional
    landDelivery(dir, "d1", 3L)
    landDelivery(dir, "d2", 2L)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // v1 (the bulk) and the flush land while down
    landDelivery(dir, "d3", 1L)
    landFlush(dir, "d9_flush")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out.toString)
    val got = rows.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("version"),
        r.getAs[String]("h"))).toSet
    assert(rows.count() == got.size,
      "duplicate snapshot rows after restart")
    val want = twinRows()
    assert(got == want,
      s"restart lost/invented rows: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
  }
}
