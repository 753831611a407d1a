package graft

import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.warc.{WarcCdx, WarcFileSlice, WarcReadStats, WarcSynth}

/** `.wcdx` record-offset sidecars: index writing (plain + member-gzip),
  * record-range splits that stay row-identical to the whole-file scan
  * (the PartitionInvarianceSpec pattern), mid-file member entry,
  * O(index) surveys that touch zero warc bytes, misframed-gzip
  * refusal, and stale-sidecar hygiene. */
class WarcCdxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def conf = spark.sessionState.newHadoopConf()

  private def fixture(n: Int): String = {
    val dir = Files.createTempDirectory(s"wcdx_fx$n").toString
    WarcSynth.ensureFixture(dir, n)
  }

  test("indexing a plain and a member-gzip file records one entry per " +
      "record with survey fields; offsets enter mid-file") {
    val dir = fixture(120)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(f => f.endsWith(".warc") || f.endsWith(".warc.gz")).sorted
    files.foreach { f =>
      val n = WarcCdx.writeIndex(conf, new Path(f))
      // warcinfo + request/response per page in this file
      assert(n >= 1 + 2 * (120 / 4 - 1), s"$f indexed only $n records")
      assert(Files.exists(Paths.get(f + ".wcdx")))
    }
    // survey fields present and consistent across both framings
    val survey = WarcCdx.survey(spark, dir)
    val byType = survey.groupBy("rec_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("warcinfo" -> 4L, "request" -> 120L,
      "response" -> 120L))
    // a response entry in the gzip file has a usable member offset:
    // slice from it and read records
    val gz = files.find(_.endsWith(".warc.gz")).get
    val (framing, offsets) = WarcCdx.readOffsets(
      new Path(gz).getFileSystem(conf),
      new Path(gz).getFileSystem(conf).getFileStatus(new Path(gz))).get
    assert(framing == "member-gzip")
    assert(offsets.length >= 60 && offsets(0) == 0L)
    // enter at the 11th record's member and read TO EOF: exactly the
    // records from there on
    val whole = spark.read.format("warc").load(gz)
      .select("record_id").collect().map(_.getString(0))
    val slice = WarcFileSlice(gz, offsets(10), -1L)
    val reader = new graft.sources.warc.WarcPartitionReader(
      Seq(slice), conf, graft.sources.warc.WarcTable.ReadSchema, 1L << 30)
    var got = List.empty[String]
    while (reader.next())
      got ::= reader.get()
        .getUTF8String(2).toString // record_id ordinal in full schema
    reader.close()
    assert(got.reverse == whole.drop(10).toList,
      "mid-file entry record set differs")
  }

  test("record-range splits: a big indexed member-gzip file plans " +
      "many slices and returns the EXACT whole-file row set") {
    val dir = Files.createTempDirectory("wcdx_split").toString
    val p = Paths.get(dir, "big.warc.gz")
    val os = Files.newOutputStream(p)
    val n = 900
    try WarcSynth.gzipMembers(
      Iterator(WarcSynth.warcinfoRecord(0)) ++
        (0 until n).iterator.flatMap(i => Iterator(
          WarcSynth.requestRecord(i.toLong),
          WarcSynth.responseRecord(i.toLong))), os)
    finally os.close()
    WarcCdx.writeIndex(conf, new Path(p.toString))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("rec_type", "record_id", "url",
        "coalesce(http_status, -1)", "md5(payload)", "content_length")
      .collect().map(_.toSeq).toSet
    val whole = spark.read.format("warc").option("useWcdx", "false")
      .load(p.toString)
    val split = spark.read.format("warc")
      .option("maxBytesPerPartition", "8k").load(p.toString)
    assert(whole.rdd.getNumPartitions == 1)
    val nSplit = split.rdd.getNumPartitions
    assert(nSplit >= 4, s"expected many range slices, got $nSplit")
    assert(rows(split) == rows(whole), "range-split rows differ")
    // pushdown still applies inside slices
    val respSplit = spark.read.format("warc")
      .option("maxBytesPerPartition", "8k").load(p.toString)
      .filter(org.apache.spark.sql.functions.col("rec_type") === "response")
      .count()
    assert(respSplit == n)
  }

  test("plain files split by raw record offsets too") {
    val dir = Files.createTempDirectory("wcdx_plain").toString
    val p = Paths.get(dir, "big.warc")
    val n = 600
    Files.write(p, (0 until n).map(i =>
      WarcSynth.responseRecord(i.toLong)).reduce(_ ++ _))
    WarcCdx.writeIndex(conf, new Path(p.toString))
    val split = spark.read.format("warc")
      .option("maxBytesPerPartition", "16k").load(p.toString)
    assert(split.rdd.getNumPartitions >= 4)
    val whole = spark.read.format("warc").option("useWcdx", "false")
      .load(p.toString)
    assert(split.select("record_id").collect().map(_.getString(0)).sorted
      .sameElements(
        whole.select("record_id").collect().map(_.getString(0)).sorted))
  }

  test("record-per-frame .warc.zst indexes (skippable frames stepped " +
      "over), range-splits, and enters mid-file at frame offsets") {
    val dir = Files.createTempDirectory("wcdx_zst").toString
    val p = Paths.get(dir, "big.warc.zst")
    val n = 500
    val os = Files.newOutputStream(p)
    try {
      (0 until n).foreach { i =>
        os.write(com.github.luben.zstd.Zstd.compress(
          WarcSynth.responseRecord(i.toLong)))
        if (i == 100) {
          // a skippable frame mid-stream (magic 0x184D2A50, 4-byte
          // size, payload) — archive.org writes dictionary frames
          os.write(Array[Byte](0x50, 0x2A, 0x4D, 0x18, 6, 0, 0, 0))
          os.write("sixbyt".getBytes("US-ASCII"))
        }
      }
    } finally os.close()
    val count = WarcCdx.writeIndex(conf, new Path(p.toString))
    assert(count == n)
    val fs = new Path(p.toString).getFileSystem(conf)
    val (framing, offsets) = WarcCdx.readOffsets(fs,
      fs.getFileStatus(new Path(p.toString))).get
    assert(framing == "frame-zstd" && offsets.length == n)
    // range-split scan row-identical to whole-file
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("record_id").collect().map(_.getString(0)).sorted.toSeq
    val whole = spark.read.format("warc").option("useWcdx", "false")
      .load(p.toString)
    val split = spark.read.format("warc")
      .option("maxBytesPerPartition", "8k").load(p.toString)
    assert(split.rdd.getNumPartitions >= 4)
    assert(ids(split) == ids(whole) && ids(whole).length == n)
    // mid-file entry at the 50th record's frame
    val reader = new graft.sources.warc.WarcPartitionReader(
      Seq(graft.sources.warc.WarcFileSlice(p.toString, offsets(50), -1L)),
      conf, graft.sources.warc.WarcTable.ReadSchema, 1L << 30)
    var got = 0
    while (reader.next()) got += 1
    reader.close()
    assert(got == n - 50)
  }

  test("CDX-pruned planning: a pushed url point-lookup plans one " +
      "slice and walks ONE record; a no-match predicate plans zero " +
      "partitions; results match the unpruned plan") {
    import org.apache.spark.sql.functions.col
    val dir = fixture(400)
    WarcCdx.ensureIndexed(conf, dir)
    val target = WarcSynth.urlOf(123)
    def lookup(useCdx: Boolean) = spark.read.format("warc")
      .option("useWcdx", useCdx.toString).load(dir)
      .filter(col("rec_type") === "response" && col("url") === target)
      .select("url", "payload")
    WarcReadStats.recordsRead.reset()
    val pruned = lookup(useCdx = true)
    val rows = pruned.collect()
    assert(rows.length == 1 &&
      new String(rows(0).getAs[Array[Byte]](1), "US-ASCII") ==
        WarcSynth.htmlOf(123))
    assert(pruned.rdd.getNumPartitions == 1,
      s"point lookup planned ${pruned.rdd.getNumPartitions} partitions")
    assert(WarcReadStats.recordsRead.sum() <= 2,
      s"point lookup walked ${WarcReadStats.recordsRead.sum()} records")
    // parity with the unpruned plan
    val full = lookup(useCdx = false).collect()
    assert(full.length == 1 && full(0).getString(0) == target)
    // a predicate matching nothing plans zero partitions, zero rows
    val none = spark.read.format("warc").load(dir)
      .filter(col("url") === "http://nosuch.example/x")
      .select("url")
    assert(none.collect().isEmpty)
    // http-stage predicates prune at the planner too: 404s only
    val notFound = spark.read.format("warc").load(dir)
      .filter(col("rec_type") === "response" &&
        col("http_status") === 404)
      .select("url").collect()
    assert(notFound.length == (0 until 400).count(_ % 17 == 0))
  }

  test("warc_date range predicates push to both skip points: the walk " +
      "skips out-of-window blocks, and the CDX planner prunes " +
      "out-of-window records from the slices") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("wcdx_dated").toString
    val p = Paths.get(dir, "dated.warc")
    val n = 280 // 10 pages per February day
    Files.write(p, (0 until n).map(i =>
      WarcSynth.datedResponseRecord(i.toLong)).reduce(_ ++ _))
    // 1. walk-level skip (no sidecar yet): out-of-window blocks skipped
    WarcReadStats.payloadBytesSkipped.reset()
    val window = spark.read.format("warc").load(p.toString)
      .filter(col("warc_date") >= "2026-02-20" &&
        col("warc_date") < "2026-02-23")
      .select("url", "payload")
    val rows = window.collect()
    val want = (0 until n).filter(i => {
      val d = 1 + i % 28; d >= 20 && d <= 22
    })
    assert(rows.length == want.size)
    assert(WarcReadStats.payloadBytesSkipped.sum() > 0,
      "out-of-window blocks were not skipped")
    // 2. planner-level pruning once indexed: the slices cover only
    // the window's records
    WarcCdx.writeIndex(conf, new Path(p.toString))
    WarcReadStats.payloadBytesSkipped.reset()
    WarcReadStats.recordsRead.reset()
    val pruned = spark.read.format("warc").load(p.toString)
      .filter(col("warc_date") >= "2026-02-20" &&
        col("warc_date") < "2026-02-23")
      .select("url", "payload")
    assert(pruned.collect().length == want.size)
    // dates repeat every 28 records, so in-window records sit in many
    // short runs; the pruned plan never walks most of the file
    val walked = WarcReadStats.recordsRead.sum() +
      0 // skipped records don't count as read
    assert(walked <= want.size + 10,
      s"cdx pruning walked $walked records for ${want.size} matches")
  }

  test("an O(index) survey reads zero warc bytes (no record walk)") {
    val dir = fixture(160)
    WarcCdx.ensureIndexed(conf, dir)
    WarcReadStats.recordsRead.reset()
    val counts = WarcCdx.survey(spark, dir)
      .groupBy("rec_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("response") == 160)
    assert(WarcReadStats.recordsRead.sum() == 0,
      "survey walked warc records")
  }

  test("whole-file gzip (records NOT member-framed) refuses to index " +
      "— a lying index would plan unenterable offsets") {
    val dir = Files.createTempDirectory("wcdx_misframed").toString
    val p = Paths.get(dir, "solid.warc.gz")
    val os = new java.util.zip.GZIPOutputStream(Files.newOutputStream(p))
    try (0 until 10).foreach(i => os.write(
      WarcSynth.responseRecord(i.toLong)))
    finally os.close()
    val ex = intercept[IllegalArgumentException] {
      WarcCdx.writeIndex(conf, new Path(p.toString))
    }
    assert(ex.getMessage.contains("member"),
      s"wrong refusal: ${ex.getMessage}")
    // and ensureIndexed skips it instead of failing the job
    assert(WarcCdx.ensureIndexed(conf, dir) == 0)
    // the scan itself still reads the file whole
    assert(spark.read.format("warc").load(p.toString).count() == 10)
  }

  test("COUNT(*) answers from the .wcdx headers alone when every file " +
      "is indexed — one row, zero warc bytes; filters and missing " +
      "sidecars fall back to the real walk") {
    val dir = fixture(240)
    WarcCdx.ensureIndexed(conf, dir)
    WarcReadStats.recordsRead.reset()
    val df = spark.read.format("warc").load(dir)
    val counted = df.count()
    assert(counted == 4 + 2 * 240, s"sidecar count wrong: $counted")
    assert(df.groupBy().count().queryExecution.executedPlan.toString
      .contains("WarcStatsScan"), "count did not plan the stats scan")
    assert(WarcReadStats.recordsRead.sum() == 0,
      "metadata count walked records")
    // a filter falls back to the real scan and still counts right
    val filtered = spark.read.format("warc").load(dir)
      .filter(org.apache.spark.sql.functions.col("rec_type") === "response")
      .count()
    assert(filtered == 240)
    // pushdown disabled: real walk, same number
    assert(spark.read.format("warc").option("countPushdown", "false")
      .load(dir).count() == counted)
    // statistics expose the exact row count for broadcast planning
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", dir))
    val scan = new graft.sources.warc.WarcScanBuilder(opts).build()
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics]
    assert(scan.estimateStatistics().numRows().getAsLong == counted)
  }

  test("a stale sidecar (older than its warc) never influences " +
      "planning") {
    val dir = Files.createTempDirectory("wcdx_stale").toString
    val p = Paths.get(dir, "a.warc")
    Files.write(p, (0 until 50).map(i =>
      WarcSynth.responseRecord(i.toLong)).reduce(_ ++ _))
    WarcCdx.writeIndex(conf, new Path(p.toString))
    // rewrite the warc AFTER the sidecar: sidecar is now stale
    Thread.sleep(1100) // fs mtime granularity
    Files.write(p, (0 until 80).map(i =>
      WarcSynth.responseRecord(i.toLong)).reduce(_ ++ _))
    val fs = new Path(p.toString).getFileSystem(conf)
    val st = fs.getFileStatus(new Path(p.toString))
    assert(WarcCdx.readOffsets(fs, st).isEmpty, "stale sidecar used")
    // scan is whole-file and correct
    assert(spark.read.format("warc")
      .option("maxBytesPerPartition", "4k").load(p.toString)
      .count() == 80)
    // re-indexing refreshes it
    WarcCdx.ensureIndexed(conf, dir)
    assert(WarcCdx.readOffsets(fs,
      fs.getFileStatus(new Path(p.toString))).get._2.length == 80)
  }

  test("a warc rewritten to a different length under a PRESERVED " +
      "mtime is still stale — freshness is anchored to the length " +
      "recorded in the header, not mtime ordering alone") {
    val dir = Files.createTempDirectory("wcdx_lenstale").toString
    val p = Paths.get(dir, "a.warc")
    Files.write(p, (0 until 50).map(i =>
      WarcSynth.responseRecord(i.toLong)).reduce(_ ++ _))
    WarcCdx.writeIndex(conf, new Path(p.toString))
    val sidecarMtime = Files.getLastModifiedTime(
      Paths.get(p.toString + WarcCdx.SidecarSuffix))
    // rewrite with more records, then set the warc's mtime BEHIND the
    // sidecar's — the copied-with-preserved-timestamps scenario where
    // mtime ordering alone would call the sidecar fresh
    Files.write(p, (0 until 80).map(i =>
      WarcSynth.responseRecord(i.toLong)).reduce(_ ++ _))
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        sidecarMtime.toMillis - 10000))
    val fs = new Path(p.toString).getFileSystem(conf)
    val st = fs.getFileStatus(new Path(p.toString))
    assert(WarcCdx.readOffsets(fs, st).isEmpty,
      "length-mismatched sidecar used for offsets")
    assert(WarcCdx.readCount(fs, st).isEmpty,
      "length-mismatched sidecar used for count")
    assert(WarcCdx.readEntries(fs, st).isEmpty,
      "length-mismatched sidecar used for entries")
    // the scan still answers correctly (whole-file walk)
    assert(spark.read.format("warc").load(p.toString).count() == 80)
  }

  test("a FOREIGN CDXJ index prunes planning: a point lookup plans " +
      "ONE record slice at the member's exact extent, a no-match " +
      "predicate plans ZERO partitions, and the rows are identical " +
      "to the unindexed whole-file scan") {
    import graft.sources.warc.{WarcInputPartition, WarcScan,
      WarcScanBuilder}
    val dir = Files.createTempDirectory("warc_foreign_cdx").toString
    val p = Paths.get(dir, "crawl-00.warc.gz")
    val os = Files.newOutputStream(p)
    try WarcSynth.gzipMembers(
      (0 until 40).iterator.map(i => WarcSynth.responseRecord(i.toLong)),
      os)
    finally os.close()
    // CDXJ lines from an independent member walk — NO .wcdx exists
    val w = new WarcCdx.MemberGzipWalker(Files.newInputStream(p))
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val extents = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (w.next()) {
      val url = WarcSynth.urlOf(i.toLong)
      extents += ((w.memberStart, w.memberLen))
      lines += s"""key$i 20260201000000 {"url":"$url","mime":"text/html","status":"${
        WarcSynth.statusOf(i.toLong)}","digest":"d$i","length":"${
        w.memberLen}","offset":"${w.memberStart}","filename":"crawl-00.warc.gz"}"""
      i += 1
    }
    Files.write(Paths.get(dir, "_index.cdxj"),
      lines.mkString("\n").getBytes("UTF-8"))
    def planWith(url: String): Array[
        org.apache.spark.sql.connector.read.InputPartition] = {
      val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", dir, "cdx", s"$dir/_index.cdxj"))
      val b = new WarcScanBuilder(opts)
      b.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("url",
        url)))
      b.build().asInstanceOf[WarcScan].toBatch.planInputPartitions()
    }
    // point lookup: exactly the record's member extent, one slice
    val hit = planWith(WarcSynth.urlOf(7))
    assert(hit.length == 1, s"expected 1 partition, got ${hit.length}")
    val slices = hit(0).asInstanceOf[WarcInputPartition].slices
    assert(slices.length == 1)
    assert(slices(0).start == extents(7)._1 &&
      slices(0).length == extents(7)._2,
      s"slice ${slices(0)} != member extent ${extents(7)}")
    // no-match: zero partitions, zero bytes planned
    assert(planWith("http://no-such.example/x").isEmpty,
      "a no-match predicate must plan zero partitions")
    // row parity: the pruned read equals the whole-file scan's row
    val target = WarcSynth.urlOf(7)
    import org.apache.spark.sql.functions.{col, md5}
    def rowOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("url") === target)
        .select(col("url"), col("http_status"), md5(col("payload")))
        .collect().toSeq
    WarcReadStats.recordsRead.reset()
    val pruned = rowOf(spark.read.format("warc")
      .option("cdx", s"$dir/_index.cdxj").load(dir))
    val prunedReads = WarcReadStats.recordsRead.sum()
    val whole = rowOf(spark.read.format("warc").load(dir))
    assert(pruned == whole && pruned.nonEmpty)
    assert(prunedReads == 1,
      s"point lookup read $prunedReads records instead of 1")
  }

  test("cluster.idx point lookups read a BOUNDED number of cdx " +
      "blocks (disk binary search, no full index load), plan one " +
      "slice per hit, and zero partitions on no-match") {
    import graft.sources.warc.{WarcForeignCdx, WarcInputPartition,
      WarcScan, WarcScanBuilder}
    val dir = Files.createTempDirectory("warc_cluster").toString
    val p = Paths.get(dir, "crawl-00.warc.gz")
    val os = Files.newOutputStream(p)
    try WarcSynth.gzipMembers(
      (0 until 60).iterator.map(i => WarcSynth.responseRecord(i.toLong)),
      os)
    finally os.close()
    // CDXJ lines (sorted by surt key) from an independent member walk
    val w = new WarcCdx.MemberGzipWalker(Files.newInputStream(p))
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (w.next()) {
      val url = WarcSynth.urlOf(i.toLong)
      lines += s"""${WarcForeignCdx.surtKey(url)} 20260201000000 {"url":"$url","mime":"text/html","status":"${
        WarcSynth.statusOf(i.toLong)}","digest":"d$i","length":"${
        w.memberLen}","offset":"${w.memberStart}","filename":"crawl-00.warc.gz"}"""
      i += 1
    }
    val sorted = lines.sorted
    // sharded layout: blocks of 10 lines, each its own gzip member,
    // round-robined across 2 shards; cluster.idx points at them
    val idxDir = Paths.get(dir, "indexes")
    Files.createDirectories(idxDir)
    val shardBytes = Array.fill(2)(new java.io.ByteArrayOutputStream())
    val cluster = scala.collection.mutable.ArrayBuffer.empty[String]
    sorted.grouped(10).zipWithIndex.foreach { case (blk, bi) =>
      val sh = bi % 2
      val off = shardBytes(sh).size()
      val bo = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write((blk.mkString("\n") + "\n").getBytes("UTF-8"))
      gz.close()
      shardBytes(sh).write(bo.toByteArray)
      val key2 = blk.head.split(" ", 3).take(2).mkString(" ")
      cluster += s"$key2\tcdx-0000$sh.gz\t$off\t${bo.size()}\t$bi"
    }
    for (sh <- 0 until 2)
      Files.write(idxDir.resolve(s"cdx-0000$sh.gz"),
        shardBytes(sh).toByteArray)
    Files.write(idxDir.resolve("cluster.idx"),
      (cluster.mkString("\n") + "\n").getBytes("UTF-8"))
    def planWith(urls: String*): Array[
        org.apache.spark.sql.connector.read.InputPartition] = {
      // mergeGap 0: pin exact per-record slices (the default 64 KB
      // gap legitimately merges nearby hits into one run)
      val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", dir, "cdx", s"$dir/indexes",
          "cdxMergeGap", "0"))
      val b = new WarcScanBuilder(opts)
      b.pushFilters(Array(org.apache.spark.sql.sources.In("url",
        urls.toArray[Any])))
      b.build().asInstanceOf[WarcScan].toBatch.planInputPartitions()
    }
    WarcForeignCdx.blocksRead.reset()
    val hit = planWith(WarcSynth.urlOf(23), WarcSynth.urlOf(51))
    val blocks = WarcForeignCdx.blocksRead.sum()
    assert(blocks >= 1 && blocks <= 4,
      s"expected <= 2 blocks per lookup, read $blocks")
    val slices = hit.flatMap(_.asInstanceOf[WarcInputPartition].slices)
    assert(slices.length == 2,
      s"expected 2 record slices, got ${slices.toSeq}")
    // no-match: zero partitions, still bounded block reads
    WarcForeignCdx.blocksRead.reset()
    assert(planWith("http://zzz-no-such.example/x").isEmpty)
    assert(WarcForeignCdx.blocksRead.sum() <= 2)
    // row parity with the whole-file scan
    import org.apache.spark.sql.functions.{col, md5}
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("url").isin(WarcSynth.urlOf(23), WarcSynth.urlOf(51)))
        .select(col("url"), md5(col("payload")))
        .collect().sortBy(_.getString(0)).toSeq
    val pruned = rowsOf(spark.read.format("warc")
      .option("cdx", s"$dir/indexes").load(dir))
    val whole = rowsOf(spark.read.format("warc").load(dir))
    assert(pruned == whole && pruned.length == 2)
  }

  test("cluster.idx PREFIX scans plan exactly the site's records from " +
      "a bounded block range; host-incomplete prefixes stay off the " +
      "range path") {
    import graft.sources.warc.{WarcForeignCdx, WarcInputPartition,
      WarcScan, WarcScanBuilder}
    val dir = Files.createTempDirectory("warc_prefix").toString
    val p = Paths.get(dir, "crawl-00.warc.gz")
    val n = 200 // urlOf site = i % 50 -> 4 pages per site
    val os = Files.newOutputStream(p)
    try WarcSynth.gzipMembers(
      (0 until n).iterator.map(i => WarcSynth.responseRecord(i.toLong)),
      os)
    finally os.close()
    val w = new WarcCdx.MemberGzipWalker(Files.newInputStream(p))
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (w.next()) {
      val url = WarcSynth.urlOf(i.toLong)
      lines += s"""${WarcForeignCdx.surtKey(url)} 20260201000000 {"url":"$url","mime":"text/html","status":"200","digest":"d$i","length":"${
        w.memberLen}","offset":"${w.memberStart}","filename":"crawl-00.warc.gz"}"""
      i += 1
    }
    val idxDir = Paths.get(dir, "indexes")
    Files.createDirectories(idxDir)
    val shard = new java.io.ByteArrayOutputStream()
    val cluster = scala.collection.mutable.ArrayBuffer.empty[String]
    lines.sorted.grouped(20).zipWithIndex.foreach { case (blk, bi) =>
      val off = shard.size()
      val bo = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write((blk.mkString("\n") + "\n").getBytes("UTF-8"))
      gz.close()
      shard.write(bo.toByteArray)
      val key2 = blk.head.split(" ", 3).take(2).mkString(" ")
      cluster += s"$key2\tcdx-00000.gz\t$off\t${bo.size()}\t$bi"
    }
    Files.write(idxDir.resolve("cdx-00000.gz"), shard.toByteArray)
    Files.write(idxDir.resolve("cluster.idx"),
      (cluster.mkString("\n") + "\n").getBytes("UTF-8"))
    def planWith(prefix: String): Array[
        org.apache.spark.sql.connector.read.InputPartition] = {
      val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", dir, "cdx", s"$dir/indexes",
          "cdxMergeGap", "0"))
      val b = new WarcScanBuilder(opts)
      b.pushFilters(Array(
        org.apache.spark.sql.sources.StringStartsWith("url", prefix)))
      b.build().asInstanceOf[WarcScan].toBatch.planInputPartitions()
    }
    assert(WarcForeignCdx.rangeablePrefix("http://site7.example/"))
    assert(!WarcForeignCdx.rangeablePrefix("http://site7.example"))
    assert(!WarcForeignCdx.rangeablePrefix("site7"))
    WarcForeignCdx.blocksRead.reset()
    val hit = planWith("http://site7.example/")
    val blocks = WarcForeignCdx.blocksRead.sum()
    assert(blocks >= 1 && blocks <= 3,
      s"prefix range should touch a bounded block run, read $blocks")
    val slices = hit.flatMap(_.asInstanceOf[WarcInputPartition].slices)
    assert(slices.length == 4,
      s"expected the site's 4 record slices, got ${slices.toSeq}")
    // no-match prefix: zero partitions, still bounded block reads
    WarcForeignCdx.blocksRead.reset()
    assert(planWith("http://zzz-no-such.example/").isEmpty)
    assert(WarcForeignCdx.blocksRead.sum() <= 2)
    // host-incomplete prefix: range path declines, the full-load path
    // still prunes via the compiled predicate — and never misses
    WarcForeignCdx.blocksRead.reset()
    val fb = planWith("http://site7.example")
    assert(WarcForeignCdx.blocksRead.sum() == 0,
      "host-incomplete prefix must not use the cluster range path")
    assert(fb.flatMap(_.asInstanceOf[WarcInputPartition].slices)
      .length == 4)
    // row parity with the whole-file scan
    import org.apache.spark.sql.functions.{col, md5}
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("url").startsWith("http://site7.example/"))
        .select(col("url"), md5(col("payload")))
        .collect().sortBy(_.getString(0)).toSeq
    val pruned = rowsOf(spark.read.format("warc")
      .option("cdx", s"$dir/indexes").load(dir))
    val whole = rowsOf(spark.read.format("warc").load(dir))
    assert(pruned == whole && pruned.length == 4)
  }

  test("survey parses sidecar lines as raw tab-separated text — a " +
      "url field beginning with a double quote survives verbatim") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("wcdx_quote").toString
    val url = "\"http://quoted.example/a\""
    Seq((url, 200, "text/plain", "body".getBytes("UTF-8")))
      .toDF("url", "http_status", "http_content_type", "payload")
      .coalesce(1).write.format("warc").mode("append").save(dir)
    val urls = WarcCdx.survey(spark, dir)
      .select(col("url")).collect().map(_.getString(0))
    assert(urls.toSeq == Seq(url),
      s"survey mangled the quoted url: ${urls.mkString("|")}")
  }
}
