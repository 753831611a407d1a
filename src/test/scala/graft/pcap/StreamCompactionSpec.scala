package graft.pcap

import java.nio.file.{Files, Path}


import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-state compaction of the pcap landing stream (round-6 verdict
  * #3): under sustained file churn the seen-files log must stay bounded
  * by the retention window, while offsets remain exactly-once —
  * including across a restart whose rebuilt listing has lost the
  * aged-out prefix. */
class StreamCompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val WaveSize = 150
  private val WaveGapMs = 10000L
  private val AgeMs = 25000L // keeps ~2.5 waves in the retention window
  private val T0 = 1700000000000L

  /** One tiny single-packet capture; src_port encodes the global file
    * index so exactly-once is checkable as a distinct-count. The
    * synthetic mtime is stamped BEFORE the atomic publish — a live
    * query listing mid-land must never observe a wall-clock mtime,
    * which would permanently poison the retention horizon's
    * latestMtime high-water mark. */
  private def landWave(dir: Path, wave: Int): Unit = {
    val mtime = T0 + wave * WaveGapMs
    (0 until WaveSize).foreach { i =>
      val idx = wave * WaveSize + i
      val frame = PcapSynth.ipv4TcpFrame(
        src = Array[Byte](10, 60, (idx >> 8).toByte, idx.toByte),
        dst = Array[Byte](10, 61, 0, 1),
        srcPort = 10000 + idx, dstPort = 80, ttl = 64,
        payload = s"f$idx".getBytes("US-ASCII"), seq = 1L, flags = 0x18)
      PcapSynth.writeAtomicWithMtime(dir.resolve(f"w${wave}%02d_$i%03d.pcap"),
        PcapSynth.file(Seq((1700000000L, 0L, frame))), mtime)
    }
  }

  test("offsets round-trip: marker format and legacy count-only both parse") {
    import graft.sources.pcap.PcapStreamOffset
    val withMarker = PcapStreamOffset(42,
      Some((1700000123456L, "file:/data/a|b.pcap")))
    assert(PcapStreamOffset.parse(withMarker.json()) == withMarker,
      "pipe in the path must not ambiguate (path is the last field)")
    val legacy = PcapStreamOffset.parse("7")
    assert(legacy == PcapStreamOffset(7, None) && legacy.json() == "7",
      "pre-round-7 checkpoints carry bare counts and must keep parsing")
    intercept[IllegalArgumentException](PcapStreamOffset.parse("a|b"))
  }

  test("restart where FEWER processed files aged out than pending exist " +
       "still aligns (marker splits the listing, not count overflow)") {
    // waves 0,1,2 processed; waves 3,4 land while down; at restart the
    // horizon has dropped only wave 0+1 of the PROCESSED files, so the
    // listing (waves 2,3,4 = 450) is exactly as long as the recovered
    // count (450) — a count-overflow-only rebase would never fire and
    // the run would skip/stall; the offset's (mtime, path) marker must
    // place wave 2 below the count and waves 3,4 after it
    val dir = Files.createTempDirectory("pcap_align")
    val ckpt = Files.createTempDirectory("pcap_align_ckpt")
    val out = Files.createTempDirectory("pcap_align_out")
    def start() = spark.readStream.format("pcap")
      .option("maxFileAgeMs", AgeMs.toString)
      .load(dir.toString)
      .select("src_port", "file")
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .start()
    val q1 = start()
    try {
      (0 until 3).foreach { w => landWave(dir, w); q1.processAllAvailable() }
    } finally q1.stop()
    landWave(dir, 3)
    landWave(dir, 4)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out.toString)
      assert(rows.count() == 5 * WaveSize,
        "oldest pending wave skipped or replayed after partial aging")
      assert(rows.select("src_port").distinct().count() == 5 * WaveSize)
    } finally q2.stop()
  }

  test(".tsidx sidecars in the landing directory are never planned as captures") {
    // a landing ETL that writes stats sidecars next to its captures
    // (exactly what the pcap SINK does) must not crash the stream: the
    // sidecar is neither '_'- nor '.'-prefixed, so only the shared
    // PcapTable.isDataFile predicate keeps it out of discovery
    val dir = Files.createTempDirectory("pcap_sidecar_stream")
    val frame = PcapSynth.ipv4TcpFrame(
      src = Array[Byte](10, 62, 0, 1), dst = Array[Byte](10, 63, 0, 1),
      srcPort = 12345, dstPort = 80, ttl = 64,
      payload = "x".getBytes("US-ASCII"), seq = 1L, flags = 0x18)
    PcapSynth.writeAtomic(dir.resolve("cap.pcap"),
      PcapSynth.file(Seq((1700000000L, 0L, frame))))
    Files.write(dir.resolve("cap.pcap.tsidx"),
      "not a capture".getBytes("US-ASCII"))
    val q = spark.readStream.format("pcap").load(dir.toString)
      .select("src_port")
      .writeStream.format("memory").queryName("sidecar_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sidecar_stream").count() == 1,
        "expected exactly the capture's packet, no sidecar-crash")
    } finally q.stop()
  }

  test("straggler processed last cannot regress the restart marker") {
    // wave 1 lands and processes FIRST; wave 0 (older mtime — a
    // straggler) lands and processes after it. The offset marker must
    // be the MAX processed key, not the last batch's: a marker
    // regressed to the straggler's key would make a restart count the
    // newer wave as pending and replay all 150 of its files
    val dir = Files.createTempDirectory("pcap_straggle")
    val ckpt = Files.createTempDirectory("pcap_straggle_ckpt")
    val out = Files.createTempDirectory("pcap_straggle_out")
    def start() = spark.readStream.format("pcap")
      .option("maxFileAgeMs", AgeMs.toString)
      .load(dir.toString)
      .select("src_port", "file")
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .start()
    val q1 = start()
    try {
      landWave(dir, 1); q1.processAllAvailable()
      landWave(dir, 0); q1.processAllAvailable() // straggler batch
    } finally q1.stop()
    landWave(dir, 2)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out.toString)
      assert(rows.count() == 3 * WaveSize,
        "replayed or lost a wave across the straggler restart")
      assert(rows.select("src_port").distinct().count() == 3 * WaveSize)
    } finally q2.stop()
  }

  test("seen-files state stays bounded under churn; restart past aged-out " +
       "prefix is exactly-once") {
    val dir = Files.createTempDirectory("pcap_compact")
    val ckpt = Files.createTempDirectory("pcap_compact_ckpt")
    val out = Files.createTempDirectory("pcap_compact_out")
    def start() = spark.readStream.format("pcap")
      .option("maxFileAgeMs", AgeMs.toString)
      .load(dir.toString)
      .select("src_port", "file")
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .start()

    val q1 = start()
    try {
      (0 until 6).foreach { w => landWave(dir, w); q1.processAllAvailable() }
    } finally q1.stop()

    val (seen, tailLen, base) =
      graft.sources.pcap.PcapMicroBatchStream.lastTrackedState
    // 900 files landed; only waves within AgeMs of the newest mtime may
    // remain tracked (waves 3,4,5 = 450), the rest must be purged from
    // BOTH the dedup map and the ordered log
    assert(seen <= 3 * WaveSize, s"seen map not compacted: $seen")
    assert(tailLen <= 3 * WaveSize, s"ordered log not compacted: $tailLen")
    assert(base >= 3 * WaveSize, s"no prefix was purged: base=$base")
    val afterRun1 = spark.read.parquet(out.toString)
    assert(afterRun1.count() == 6 * WaveSize)

    // restart AFTER the in-memory log compacted: the fresh instance's
    // listing is also age-filtered (it re-lists waves 4,5 as processed
    // history and nothing older), so the checkpointed count of 900
    // exceeds what it can see — the offset's (mtime, path) marker must
    // rebase the count space with no loss and no replay
    landWave(dir, 6)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out.toString)
      assert(rows.count() == 7 * WaveSize, "lost or duplicated rows on restart")
      assert(rows.select("src_port").distinct().count() == 7 * WaveSize,
        "duplicate packets after rebased restart")
    } finally q2.stop()

    // third run, Trigger.AvailableNow on the same checkpoint after MORE
    // aging: prepare() snapshots the drain target under the fresh
    // instance's numbering, the recovered offset rebases it — the run
    // must drain exactly the new wave and stop (a stale pre-rebase
    // snapshot would sit below `start` and drain nothing, forever)
    landWave(dir, 7)
    val q3 = spark.readStream.format("pcap")
      .option("maxFileAgeMs", AgeMs.toString)
      .load(dir.toString)
      .select("src_port", "file")
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q3.awaitTermination(120000), "AvailableNow drain did not stop")
      val rows = spark.read.parquet(out.toString)
      assert(rows.count() == 8 * WaveSize,
        "AvailableNow after rebase lost or duplicated rows")
      assert(rows.select("src_port").distinct().count() == 8 * WaveSize)
    } finally q3.stop()
  }
}
