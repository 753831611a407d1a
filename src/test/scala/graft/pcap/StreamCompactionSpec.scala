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

  test("offsets with a straggler journal round-trip through the v2 JSON form") {
    import graft.sources.pcap.PcapStreamOffset
    val withJournal = PcapStreamOffset(42,
      Some((1700000123456L, "file:/data/a|b.pcap")),
      Seq((7, 1700000000001L, "file:/data/strag \"x\"|.pcap"),
          (40, 1700000000002L, "file:/data/s2.pcap")))
    val js = withJournal.json()
    assert(js.startsWith("{"), "journal offsets serialize as JSON")
    assert(PcapStreamOffset.parse(js) == withJournal,
      "journal entries (incl. pipes/quotes in paths) must round-trip")
    // journal-free offsets keep the compact round-7 wire form, so
    // existing checkpoints never change shape without cause
    assert(PcapStreamOffset(42, withJournal.last).json().startsWith("42|"))
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

  test("crash between a straggler admission and its commit: the replayed " +
       "batch plans exactly the straggler files (round-8 journal)") {
    // The one restart window round 7 disclaimed: wave 1 is processed and
    // committed; wave 0 (older mtimes — stragglers) lands and is
    // ADMITTED (offset written to the WAL) but the query dies before the
    // batch commits. Spark then re-plans [o1, o2) on a FRESH instance
    // whose listing sorts wave 0 BELOW wave 1 — without the journal the
    // marker rule files wave 0 as processed history and the replay skips
    // it. Driven at the MicroBatchStream level because only there can
    // the crash point be placed deterministically between admission and
    // commit; the calls mirror MicroBatchExecution's recovery protocol,
    // offsets round-tripping through their WAL json form.
    import graft.sources.pcap.{PcapMicroBatchStream, PcapStreamOffset, PcapInputPartition}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("pcap_strag_crash")
    def mkStream() = new PcapMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of(
        "path", dir.toString, "maxFileAgeMs", AgeMs.toString)),
      graft.sources.pcap.PcapSchema.full,
      spark.sparkContext.hadoopConfiguration)
    def files(parts: Array[org.apache.spark.sql.connector.read.InputPartition]) =
      parts.flatMap(_.asInstanceOf[PcapInputPartition].files)
        .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    def wave(w: Int) =
      (0 until WaveSize).map(i => f"w$w%02d_$i%03d.pcap").toSet

    val a = mkStream()
    landWave(dir, 1)
    val o0 = a.initialOffset().asInstanceOf[PcapStreamOffset]
    val o1 = a.latestOffset(o0, ReadLimit.allAvailable())
      .asInstanceOf[PcapStreamOffset]
    assert(files(a.planInputPartitions(o0, o1)) == wave(1))
    a.commit(o1)
    landWave(dir, 0) // stragglers: every mtime behind wave 1's
    val o2 = a.latestOffset(o1, ReadLimit.allAvailable())
      .asInstanceOf[PcapStreamOffset]
    assert(o2.count == 2 * WaveSize && o2.stragglers.size == WaveSize,
      "the admission must journal every straggler")
    // CRASH here: batch [o1, o2) planned (offset durably in the WAL via
    // json) but never committed. Recovery on a fresh instance:
    val b = mkStream()
    val o1r = PcapStreamOffset.parse(o1.json())
    val o2r = PcapStreamOffset.parse(o2.json())
    val replayed = files(b.planInputPartitions(o1r, o2r))
    assert(replayed == wave(0),
      s"replayed batch must be exactly the straggler wave, got ${replayed.size} files")
    b.commit(o2r)
    // and the run continues exactly-once: a new wave plans alone
    landWave(dir, 2)
    val o3 = b.latestOffset(o2r, ReadLimit.allAvailable())
      .asInstanceOf[PcapStreamOffset]
    assert(files(b.planInputPartitions(o2r, o3)) == wave(2),
      "post-recovery batch must contain only the new wave")
    b.commit(o3)
    // third instance, restart with everything committed: nothing pending
    val c = mkStream()
    val o3r = PcapStreamOffset.parse(o3.json())
    val o4 = c.latestOffset(o3r, ReadLimit.allAvailable())
      .asInstanceOf[PcapStreamOffset]
    assert(o4.count == o3r.count, "fully-committed restart must see no work")
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
