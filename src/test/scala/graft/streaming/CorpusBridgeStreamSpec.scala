package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pcap.PcapSynth

/** The streaming pcap→corpus bridge must produce EXACTLY the batch
  * twin's row set (`pcap_corpus_stream_twin` — itself DuckDB-oracled),
  * with conversations spanning micro-batch boundaries, and must hold
  * exactly-once across a checkpoint restart (the
  * `pcap_syn_portscan_twin` + StreamCompaction patterns combined). */
class CorpusBridgeStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val NFlows = 60

  /** The corpus fixture's segments split into `waves` capture files by
    * arrival order — every conversation's request/response segments
    * spread across the waves, so reassembly state MUST survive
    * micro-batch boundaries for any document to come out whole. */
  private def landWaves(dir: java.nio.file.Path, waves: Int,
      which: Range): Unit = {
    val segs = PcapSynth.httpCorpusSegments(NFlows)
    val per = (segs.length + waves - 1) / waves
    which.foreach { w =>
      val slice = segs.slice(w * per, math.min((w + 1) * per, segs.length))
      if (slice.nonEmpty)
        PcapSynth.writeAtomic(dir.resolve(f"wave$w%02d.pcap"),
          PcapSynth.file(slice))
    }
  }

  /** A later lone packet that survives the bridge's TCP filter and
    * advances the watermark past every conversation's idle timeout. */
  private def landFlush(dir: java.nio.file.Path, name: String,
      sec: Long): Unit =
    PcapSynth.writeAtomic(dir.resolve(name),
      PcapSynth.file(Seq((sec, 0L, PcapSynth.ipv4TcpFrame(
        Array[Byte](10, 99, 0, 1), Array[Byte](10, 99, 0, 2),
        srcPort = 1, dstPort = 2, ttl = 64,
        payload = Array[Byte](0), seq = 0L, flags = 0x18)))))

  private def twinRows(): Set[(Long, String, Long, String)] =
    graft.SparkEntry.queries("pcap_corpus_stream_twin")(
      spark, "unused").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet

  private def docStream(dir: java.nio.file.Path) =
    CorpusBridgeStream.documents(
      spark.readStream.format("pcap")
        .option("maxFilesPerTrigger", "1").load(dir.toString),
      serverPort = 80, docIdBase = 42000,
      watermark = "5 seconds", idleSeconds = 10)

  test("streamed documents match the oracled batch twin's row set " +
      "across micro-batch boundaries") {
    val dir = Files.createTempDirectory("corpus_bridge_landing")
    landWaves(dir, waves = 3, which = 0 until 3)
    val query = docStream(dir).writeStream.format("memory")
      .queryName("corpus_docs").outputMode("append").start()
    try {
      query.processAllAvailable()
      // nothing may emit before quiescence: the watermark has not
      // passed any conversation's idle horizon yet
      assert(spark.table("corpus_docs").isEmpty,
        "documents emitted before their conversations quiesced")
      // two flush packets: the first advances the watermark past every
      // idle timeout when ITS batch closes; the second triggers a
      // further batch in which the timeouts fire deterministically
      landFlush(dir, "flush1.pcap", 1700800600L)
      query.processAllAvailable()
      landFlush(dir, "flush2.pcap", 1700800700L)
      query.processAllAvailable()
      val got = spark.table("corpus_docs").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3))).toSet
      val want = twinRows()
      assert(want.nonEmpty)
      assert(got == want,
        s"streamed ${got.size} docs vs twin ${want.size}: " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    } finally query.stop()
  }

  test("a conversation overflowing the direction cap is poisoned — " +
      "no truncated-corrupt document ever emits") {
    val dir = Files.createTempDirectory("corpus_bridge_poison")
    landWaves(dir, waves = 1, which = 0 until 1)
    // a cap below every response size: EVERY conversation poisons
    val tiny = CorpusBridgeStream.documents(
      spark.readStream.format("pcap")
        .option("maxFilesPerTrigger", "1").load(dir.toString),
      serverPort = 80, docIdBase = 42000,
      watermark = "5 seconds", idleSeconds = 10,
      maxBytesPerDirection = 16)
    val query = tiny.writeStream.format("memory")
      .queryName("corpus_docs_poisoned").outputMode("append").start()
    try {
      query.processAllAvailable()
      landFlush(dir, "flush1.pcap", 1700800600L)
      query.processAllAvailable()
      landFlush(dir, "flush2.pcap", 1700800700L)
      query.processAllAvailable()
      assert(spark.table("corpus_docs_poisoned").isEmpty,
        "capped conversations must emit nothing, not truncated text")
    } finally query.stop()
  }

  test("checkpoint restart mid-capture neither loses nor duplicates " +
      "documents (exactly-once)") {
    val dir = Files.createTempDirectory("corpus_bridge_restart")
    val ckpt = Files.createTempDirectory("corpus_bridge_ckpt")
    val out = Files.createTempDirectory("corpus_bridge_out")
    def start() = docStream(dir).writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    // first instance sees only wave 0 — every conversation is cut
    // mid-stream when it dies
    landWaves(dir, waves = 3, which = 0 until 1)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // the rest of the capture lands while down; the flushes arrive
    // after the restarted instance has drained the backlog (landing
    // them earlier would race file-admission order against event time —
    // the bridge clamps its timeouts to survive that, but the assertion
    // here wants the deterministic quiescence path)
    landWaves(dir, waves = 3, which = 1 until 3)
    val q2 = start()
    try {
      q2.processAllAvailable()
      landFlush(dir, "flush1.pcap", 1700800600L)
      q2.processAllAvailable()
      landFlush(dir, "flush2.pcap", 1700800700L)
      q2.processAllAvailable()
      val rows = spark.read.parquet(out.toString)
      val got = rows.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("host"),
          r.getAs[Long]("n_tokens"), r.getAs[String]("body_md5"))).toSet
      assert(rows.count() == got.size,
        "duplicate document rows after restart")
      val want = twinRows()
      assert(got == want,
        s"restart lost/invented docs: missing=${(want -- got).take(3)} " +
          s"extra=${(got -- want).take(3)}")
    } finally q2.stop()
  }
}
