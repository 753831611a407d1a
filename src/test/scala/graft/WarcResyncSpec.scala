package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.warc.WarcSynth

/** Unindexed `.warc.gz` byte-range splitting with gzip-member resync
  * (round-16 verdict "What's missing #2"): a single big member-gzip
  * file with NO `.wcdx` sidecar must scan as multiple input
  * partitions with row-identical results to the whole-file walk. */
class WarcResyncSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** One single-file member-gzip fixture, no sidecar. */
  private def bigFixture(n: Int): String = {
    val d = Files.createTempDirectory("warc_resync")
    val recs = Iterator(WarcSynth.warcinfoRecord(0)) ++
      (0 until n).iterator.map(i => WarcSynth.responseRecord(i.toLong))
    val os = Files.newOutputStream(d.resolve("big.warc.gz"))
    try WarcSynth.gzipMembers(recs, os) finally os.close()
    d.toString
  }

  test("a sidecar-less member-gzip file splits into >1 partition and " +
      "the rows match the whole-file walk exactly") {
    val dir = bigFixture(600)
    def scan(resync: Boolean) = spark.read.format("warc")
      .option("maxBytesPerPartition", "64k")
      .option("resyncSplit", resync.toString)
      .load(dir)
    val split = scan(resync = true)
    assert(split.rdd.getNumPartitions > 1,
      s"expected >1 partition, got ${split.rdd.getNumPartitions}")
    val whole = scan(resync = false)
    assert(whole.rdd.getNumPartitions == 1,
      "opt-out must fall back to the single-task walk")
    def key(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions._
      df.select(col("record_id"), col("rec_type"), col("url"),
          md5(col("payload")).as("m"))
        .collect().map(_.toString).sorted.toSeq
    }
    val a = key(split)
    val b = key(whole)
    assert(a.length == 601 && a == b,
      s"resync rows diverge: ${a.length} vs ${b.length}")
  }

  test("a range cut INSIDE a member never loses or duplicates the " +
      "record (member ownership by first byte)") {
    // tiny maxBytes so nearly every cut lands mid-member
    val dir = bigFixture(120)
    val split = spark.read.format("warc")
      .option("maxBytesPerPartition", "4k")
      .option("resyncSplit", "true").load(dir)
    assert(split.rdd.getNumPartitions >= 8)
    val ids = split.select("record_id").collect().map(_.getString(0))
    assert(ids.length == 121, s"${ids.length} rows")
    assert(ids.distinct.length == 121, "duplicated records across cuts")
  }

  test("a multi-hundred-MB single-file crawl splits into many real " +
      "partitions (the straggler-ceiling case the chunker removes)") {
    // ~200 MB compressed: 400 members of 512 KiB incompressible body
    val d = Files.createTempDirectory("warc_resync_big")
    val rnd = new java.util.Random(17)
    def rec(i: Int): Array[Byte] = {
      val body = new Array[Byte](512 * 1024)
      rnd.nextBytes(body)
      WarcSynth.record(Seq(
        "WARC-Type" -> "resource",
        "WARC-Record-ID" -> s"<urn:uuid:big-$i>",
        "WARC-Date" -> WarcSynth.Date,
        "WARC-Target-URI" -> s"http://big.example/r$i",
        "Content-Type" -> "application/octet-stream"), body)
    }
    val os = Files.newOutputStream(d.resolve("big.warc.gz"))
    try WarcSynth.gzipMembers((0 until 400).iterator.map(rec), os)
    finally os.close()
    val len = Files.size(d.resolve("big.warc.gz"))
    assert(len > 190L * 1024 * 1024, s"fixture only $len B")
    val df = spark.read.format("warc")
      .option("maxBytesPerPartition", "32m")
      .load(d.toString) // resync is the DEFAULT for unindexed .warc.gz
    assert(df.rdd.getNumPartitions >= 5,
      s"only ${df.rdd.getNumPartitions} partitions for a $len B file")
    assert(df.select("record_id").distinct().count() == 400)
    // cleanup: this one is big enough to matter in /tmp
    Files.list(d).forEach(p => Files.delete(p))
    Files.delete(d)
  }

  test("a sidecar-less FRAME-ZSTD file splits with cuts landing " +
      "mid-frame — no lost or duplicated records, rows match the " +
      "whole-file walk") {
    val d = Files.createTempDirectory("warc_resync_zst")
    val os = Files.newOutputStream(d.resolve("big.warc.zst"))
    try {
      os.write(com.github.luben.zstd.Zstd.compress(
        WarcSynth.warcinfoRecord(0), 3))
      for (i <- 0 until 300)
        os.write(com.github.luben.zstd.Zstd.compress(
          WarcSynth.responseRecord(i.toLong), 3))
    } finally os.close()
    def scan(resync: Boolean) = spark.read.format("warc")
      .option("maxBytesPerPartition", "8k")
      .option("resyncSplit", resync.toString)
      .load(d.toString)
    val split = scan(resync = true)
    assert(split.rdd.getNumPartitions > 4,
      s"got ${split.rdd.getNumPartitions} partitions")
    def key(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions._
      df.select(col("record_id"), md5(col("payload")).as("m"))
        .collect().map(_.toString).sorted.toSeq
    }
    val a = key(split)
    assert(a.length == 301 && a.distinct.length == 301)
    assert(a == key(scan(resync = false)))
  }

  test("zst resync skips a payload-embedded frame magic (full-frame " +
      "validation gate)") {
    val d = Files.createTempDirectory("warc_resync_zstfake")
    val fake = WarcSynth.record(Seq(
      "WARC-Type" -> "resource",
      "WARC-Record-ID" -> "<urn:uuid:zfake>",
      "WARC-Date" -> WarcSynth.Date,
      "WARC-Target-URI" -> "http://x.example/zfake",
      "Content-Type" -> "application/octet-stream"),
      Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte, 9, 9, 9, 9))
    val os = Files.newOutputStream(d.resolve("f.warc.zst"))
    try {
      os.write(com.github.luben.zstd.Zstd.compress(fake, 1))
      for (i <- 0 until 60)
        os.write(com.github.luben.zstd.Zstd.compress(
          WarcSynth.responseRecord(i.toLong), 1))
    } finally os.close()
    val df = spark.read.format("warc")
      .option("maxBytesPerPartition", "2k").load(d.toString)
    assert(df.rdd.getNumPartitions >= 2)
    assert(df.count() == 61)
    assert(df.filter("record_id = '<urn:uuid:zfake>'").count() == 1)
  }

  test("a WHOLE-FILE-gzipped archive (one jumbo member) keeps the " +
      "streaming whole-file plan — the unitPerRecord probe, not the " +
      "resync ranges (review finding: resync would have bombed on it)") {
    val d = Files.createTempDirectory("warc_resync_whole")
    val os = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(d.resolve("whole.warc.gz")), 1 << 16)
    try {
      os.write(WarcSynth.warcinfoRecord(0))
      for (i <- 0 until 500) os.write(WarcSynth.responseRecord(i.toLong))
    } finally os.close()
    val df = spark.read.format("warc")
      .option("maxBytesPerPartition", "16k") // far below the file size
      .load(d.toString)
    assert(df.rdd.getNumPartitions == 1,
      s"single-member archives must not range-split, got " +
        s"${df.rdd.getNumPartitions}")
    assert(df.count() == 501)
  }

  test("findSync rejects payload bytes that merely contain the gzip " +
      "magic (gate 2/3: header parse + WARC/1. inflate)") {
    // a record whose BODY embeds 1F 8B 08 garbage: the scan must skip
    // past it to the next true member
    val d = Files.createTempDirectory("warc_resync_fake")
    val fake = WarcSynth.record(Seq(
      "WARC-Type" -> "resource",
      "WARC-Record-ID" -> "<urn:uuid:fake>",
      "WARC-Date" -> WarcSynth.Date,
      "WARC-Target-URI" -> "http://x.example/fake",
      "Content-Type" -> "application/octet-stream"),
      Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3))
    val recs = Iterator(fake) ++
      (0 until 40).iterator.map(i => WarcSynth.responseRecord(i.toLong))
    val os = Files.newOutputStream(d.resolve("f.warc.gz"))
    try WarcSynth.gzipMembers(recs, os) finally os.close()
    val df = spark.read.format("warc")
      .option("maxBytesPerPartition", "2k")
      .option("resyncSplit", "true").load(d.toString)
    assert(df.rdd.getNumPartitions >= 2)
    assert(df.count() == 41)
    assert(df.filter("record_id = '<urn:uuid:fake>'").count() == 1)
  }
}
