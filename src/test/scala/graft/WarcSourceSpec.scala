package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.warc.{WarcReadStats, WarcSynth}

/** The `warc` DSv2 source: record grammar, member-gzip walk, HTTP
  * block split, payload-prune seam, malformed-record rejection — plus
  * interop: the fixture re-parses under a CPython stdlib decoder
  * (`tools/warc_oracle.py`, the tarfile-interop pattern). */
class WarcSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def fixture(n: Int): String = {
    val dir = Files.createTempDirectory(s"warc_fx$n").toString
    WarcSynth.ensureFixture(dir, n)
  }

  test("fixture scan: schema, record populations, and the HTTP split " +
      "(status/content-type parsed off, payload = body)") {
    val dir = fixture(200)
    val df = spark.read.format("warc").load(dir)
    assert(df.columns.toSeq == Seq("file", "rec_type", "record_id",
      "refers_to", "concurrent_to", "url", "warc_date", "content_type",
      "content_length", "http_status", "http_content_type",
      "http_content_encoding", "http_headers", "payload"))
    val rows = df.collect()
    val byType = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byType == Map("warcinfo" -> 4, "request" -> 200,
      "response" -> 200))
    // requests have no status line -> null status; responses do
    // (ordinals: concurrent_to sits at 4, shifting url+ by one)
    assert(rows.filter(_.getString(1) == "request")
      .forall(_.isNullAt(9)))
    val resp = rows.filter(_.getString(1) == "response")
    assert(resp.count(r => r.getInt(9) == 404) == 200 / 17 + 1) // i%17==0
    // html response payload is the body ONLY (headers split off)
    val r42 = resp.find(_.getString(5) == WarcSynth.urlOf(42)).get
    assert(r42.getString(10) == "text/html")
    assert(r42.isNullAt(11)) // no Content-Encoding header captured
    assert(r42.getAs[Map[String, String]](12) ==
      Map("content-type" -> "text/html",
        "content-length" -> WarcSynth.bodyOf(42).length.toString))
    assert(new String(r42.getAs[Array[Byte]](13), "US-ASCII") ==
      WarcSynth.htmlOf(42))
    // non-http records carry the whole block
    val info = rows.filter(_.getString(1) == "warcinfo")
    assert(info.forall(r => new String(r.getAs[Array[Byte]](13), "US-ASCII")
      .startsWith("software: graft-warc-synth")))
    assert(info.forall(_.isNullAt(12)), "non-HTTP records carry no header map")
    // gzip and plain files both contributed
    val files = rows.map(_.getString(0)).toSet
    assert(files.exists(_.endsWith(".warc")) &&
      files.exists(_.endsWith(".warc.gz")))
  }

  test("payload-pruned projections skip page bytes (the crawl-survey " +
      "seam): a (url, status) scan allocates no body") {
    val dir = fixture(300)
    WarcReadStats.payloadBytesSkipped.reset()
    WarcReadStats.recordsRead.reset()
    val n = spark.read.format("warc").load(dir)
      .select("url", "http_status").collect().length
    assert(n == 604)
    val skipped = WarcReadStats.payloadBytesSkipped.sum()
    assert(skipped > 0, "pruned scan did not skip payload bytes")
    // the skip covers every response body + warcinfo block (request
    // bodies are empty)
    val bodyBytes = (0 until 300).map(i => WarcSynth.bodyOf(i.toLong).length)
      .sum + 4 * 60
    assert(skipped == bodyBytes, s"skipped $skipped of $bodyBytes")
  }

  test("malformed records reject instead of desyncing: bad version " +
      "line, non-numeric Content-Length, truncated block") {
    def scan(bytes: Array[Byte]): Unit = {
      val d = Files.createTempDirectory("warc_bad")
      Files.write(d.resolve("bad.warc"), bytes)
      spark.read.format("warc").load(d.toString)
        .select("rec_type", "payload").collect()
    }
    val good = WarcSynth.responseRecord(7)
    // 1. version line corrupted
    val noVersion = good.clone()
    noVersion(0) = 'X'
    intercept[Exception] { scan(noVersion) }
    // 2. non-numeric Content-Length
    val s = new String(good, "ISO-8859-1")
    val badLen = s.replaceFirst("(?m)^Content-Length: \\d+",
      "Content-Length: 12x4").getBytes("ISO-8859-1")
    intercept[Exception] { scan(badLen) }
    // 3. truncated block (honest length, missing bytes)
    intercept[Exception] {
      scan(java.util.Arrays.copyOf(good, good.length - 30))
    }
    // control: the untouched record scans clean
    scan(good)
  }

  test("many small warc files bin-pack into few partitions (whole-file " +
      "units, the pcap/wds planning discipline)") {
    val dir = Files.createTempDirectory("warc_pack").toString
    for (f <- 0 until 12) {
      val recs = (0 until 5).map(i => WarcSynth.responseRecord(f * 5L + i))
      Files.write(Paths.get(dir, f"part-$f%02d.warc"),
        recs.reduce(_ ++ _))
    }
    // explicit 128 MB target = the million-file-lake packing shape
    val df = spark.read.format("warc")
      .option("maxBytesPerPartition", "128m").load(dir)
    assert(df.rdd.getNumPartitions <= 2,
      s"12 tiny files should pack, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 60)
    // the no-option default is scale-adaptive (BinPack.adaptiveTarget):
    // a tiny lake spreads toward cluster parallelism instead of
    // serializing on 1-2 decode tasks, bounded by one file per task
    val adaptive = spark.read.format("warc").load(dir)
    assert(adaptive.rdd.getNumPartitions > 2 &&
      adaptive.rdd.getNumPartitions <= 12,
      s"adaptive default should spread a tiny lake: " +
        s"got ${adaptive.rdd.getNumPartitions}")
    assert(adaptive.count() == 60)
  }

  test("the fixture re-parses under a CPython stdlib decoder " +
      "(tools/warc_oracle.py — gzip + the ISO 28500 grammar, no JVM code)") {
    val dir = fixture(400)
    val out = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3",
      "/root/repo/tools/warc_oracle.py", dir, "400"))
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(code == 0 && out.toString.contains("WARC_ORACLE PASS"),
      s"python decoder rejected the fixture: $out")
  }

  test("pushed rec_type predicates skip non-matching blocks during the " +
      "walk (responses-only pipelines never read request/warcinfo " +
      "blocks); pushdown-disabled parity") {
    import org.apache.spark.sql.functions.col
    val dir = fixture(200)
    WarcReadStats.payloadBytesSkipped.reset()
    val df = spark.read.format("warc").load(dir)
      .filter(col("rec_type") === "response")
      .select("url", "payload")
    assert(df.queryExecution.executedPlan.toString
      .contains("EqualTo(rec_type,response)"),
      "pushed filter missing from the scan description")
    assert(df.collect().length == 200)
    // the skip covers the WHOLE block of every filtered record: 4
    // warcinfo blocks + 200 request blocks (payload was projected, so
    // matching responses were materialized, not skipped)
    val requestBlocks = (0 until 200).map { i =>
      (s"GET /p$i HTTP/1.1\r\nHost: site${i % 50}.example\r\n" +
        "User-Agent: graft-crawler/1.0\r\n\r\n").length
    }.sum
    val infoBlocks = (0 until 4).map(f =>
      s"software: graft-warc-synth\r\nisPartOf: graft-fixture-file-$f\r\n"
        .length).sum
    assert(WarcReadStats.payloadBytesSkipped.sum() ==
      requestBlocks + infoBlocks,
      s"skip seam: ${WarcReadStats.payloadBytesSkipped.sum()} vs " +
        s"${requestBlocks + infoBlocks}")
    // disabling pushdown returns identical rows (residual filter)
    val plain = spark.read.format("warc").option("pushdown", "false")
      .load(dir).filter(col("rec_type") === "response")
      .select("url", "payload").collect().length
    assert(plain == 200)
  }

  test("continuous ingestion: files landing in waves stream the exact " +
      "batch record set exactly-once, plain and member-gzip alike") {
    val src = fixture(120)
    val land = Files.createTempDirectory("warc_stream_land")
    val files = Files.list(Paths.get(src)).toArray.map(_.toString)
      .filter(f => f.endsWith(".warc") || f.endsWith(".warc.gz")).sorted
    assert(files.length == 4)
    val query = graft.streaming.WarcStream.records(spark, land.toString)
      .writeStream.format("memory").queryName("warc_records")
      .option("checkpointLocation",
        Files.createTempDirectory("warc_stream_ckpt").toString)
      .outputMode("append").start()
    try {
      files.foreach { f =>
        Files.copy(Paths.get(f), land.resolve(Paths.get(f).getFileName))
        query.processAllAvailable()
      }
      def rowsOf(df: org.apache.spark.sql.DataFrame) = df
        .selectExpr("file", "rec_type", "record_id", "url",
          "coalesce(http_status, -1)", "md5(payload)")
        .collect().map(_.toSeq).toSet
      val got = rowsOf(spark.table("warc_records"))
      val want = rowsOf(spark.read.format("warc").load(land.toString))
      assert(got.nonEmpty && got == want,
        s"stream/batch record sets differ: ${(want -- got).take(2)}")
      // re-processing admits nothing new (the file-source log)
      query.processAllAvailable()
      assert(rowsOf(spark.table("warc_records")) == want)
    } finally query.stop()
  }

  test("chunked bodies de-chunk exactly; malformed chunk frames reject") {
    val d = Files.createTempDirectory("warc_chunky")
    Files.write(d.resolve("c.warc"), WarcSynth.chunkedResponseRecord(5))
    val rows = spark.read.format("warc").load(d.toString)
      .select("url", "payload").collect()
    assert(rows.length == 1)
    assert(new String(rows(0).getAs[Array[Byte]](1), "US-ASCII") ==
      WarcSynth.htmlOf(5), "de-chunked body differs")
    // corrupt a chunk-size hex digit -> strict rejection, not a
    // half-decoded body
    val rec = WarcSynth.chunkedResponseRecord(5)
    val s = new String(rec, "ISO-8859-1")
    val at = s.indexOf("\r\n\r\n", s.indexOf("Transfer-Encoding")) + 4
    val bad = rec.clone()
    bad(at) = 'z' // first chunk-size char
    val d2 = Files.createTempDirectory("warc_chunky_bad")
    Files.write(d2.resolve("c.warc"), bad)
    intercept[Exception] {
      spark.read.format("warc").load(d2.toString)
        .select("payload").collect()
    }
  }

  test(".warc.zst reads identically: whole-file frame and " +
      "record-per-frame (the archive.org layout) both walk") {
    val d = Files.createTempDirectory("warc_zst")
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 6L) // id 5 is the image page
    val recs = ids.map(WarcSynth.responseRecord)
    // whole-file single frame
    val whole = new com.github.luben.zstd.ZstdOutputStream(
      Files.newOutputStream(d.resolve("a.warc.zst")))
    recs.foreach(whole.write)
    whole.close()
    // one zstd frame PER RECORD, concatenated
    val out = Files.newOutputStream(d.resolve("b.warc.zst"))
    recs.foreach { r =>
      out.write(com.github.luben.zstd.Zstd.compress(r))
    }
    out.close()
    val rows = spark.read.format("warc").load(d.toString)
      .select("file", "url", "payload").collect()
    assert(rows.length == 12)
    val byFile = rows.groupBy(_.getString(0)).view
      .mapValues(_.map(r => (r.getString(1),
        new String(r.getAs[Array[Byte]](2), "US-ASCII"))).toSet).toMap
    val want = ids.map(i =>
      (WarcSynth.urlOf(i), WarcSynth.htmlOf(i))).toSet
    assert(byFile("a.warc.zst") == want && byFile("b.warc.zst") == want)
  }

  test("fuzzed WARC bytes reject or parse bounded, never hang or " +
      "misallocate (seeded random mutations over a plain file)") {
    val dir = Files.createTempDirectory("warc_fuzz").toString
    val good = (0 until 8).map(i => WarcSynth.responseRecord(i.toLong))
      .reduce(_ ++ _)
    val rnd = new scala.util.Random(4242)
    var rejected = 0
    for (_ <- 0 until 300) {
      val mut = good.clone()
      for (_ <- 0 until rnd.nextInt(4) + 1)
        mut(rnd.nextInt(mut.length)) = (rnd.nextInt(256) - 128).toByte
      Files.write(Paths.get(dir, "fuzz.warc"), mut)
      try {
        val rows = spark.read.format("warc")
          .load(Paths.get(dir, "fuzz.warc").toString)
          .select("rec_type", "payload").collect()
        // a surviving parse stays within the original record budget
        assert(rows.length <= 8)
        rows.foreach { r =>
          val p = r.getAs[Array[Byte]](1)
          assert(p == null || p.length <= good.length)
        }
      } catch { case _: Exception => rejected += 1 }
    }
    // framing-byte mutations (version line, field syntax,
    // Content-Length digits, chunk sizes) reject; mutations in field
    // VALUES, HTTP headers, and body bytes legitimately survive —
    // WARC has no checksum, so unlike tar's 250/300 the rejection
    // floor only covers the framing surface (~22% of these records'
    // bytes; seeded run rejects 66)
    assert(rejected > 40, s"only $rejected/300 rejected")
  }

  test("the scan reports real statistics to Catalyst (summed file " +
      "bytes), so small crawls are broadcast-eligible") {
    val dir = fixture(100)
    spark.read.format("warc").load(dir).count() // force session init
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", dir))
    val scan = new graft.sources.warc.WarcScanBuilder(opts).build()
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics]
    val stats = scan.estimateStatistics()
    val want = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(f => f.endsWith(".warc") || f.endsWith(".warc.gz"))
      .map(f => Files.size(Paths.get(f))).sum
    assert(stats.sizeInBytes.getAsLong == want)
  }

  test("Content-Encoding bodies decode: gzip, zlib deflate, raw " +
      "deflate (sniffed), gzip UNDER chunked framing, and brotli; " +
      "the column reports the header as captured") {
    val d = Files.createTempDirectory("warc_ce")
    // pages 0..4 cycle the five encodings (i % 5)
    val recs = (0L until 5L).map(WarcSynth.contentEncodedResponseRecord)
    Files.write(d.resolve("ce.warc"), recs.reduce(_ ++ _))
    val rows = spark.read.format("warc").load(d.toString)
      .select("url", "http_content_encoding", "payload").collect()
      .sortBy(_.getString(0))
    assert(rows.length == 5)
    val byUrl = rows.map(r => r.getString(0) ->
      (r.getString(1), new String(r.getAs[Array[Byte]](2), "US-ASCII")))
      .toMap
    for (i <- 0L until 5L) {
      val (enc, body) = byUrl(WarcSynth.urlOf(i))
      // br pages (i % 5 == 4) open with a REAL §8 static-dictionary
      // reference decoding to "Time " before the page bytes
      val want_body =
        (if (i % 5 == 4) "Time " else "") + WarcSynth.htmlOf(i)
      assert(body == want_body, s"page $i decoded wrong")
      val want = (i % 5) match {
        case 1 | 3 => "deflate"
        case 4 => "br"
        case _ => "gzip"
      }
      assert(enc == want, s"page $i encoding $enc != $want")
    }
  }

  test("a VALID-but-out-of-subset brotli body (large-window " +
      "extension) degrades to the raw bytes with the br flag intact " +
      "instead of failing the scan task (round-16 verdict #1); a " +
      "CORRUPT brotli body still rejects") {
    // large-window WBITS pattern (reserved in RFC 7932): header bits
    // 1,000,001 -> first byte 0x11
    val lwBody = Array[Byte](0x11, 0x22, 0x33, 0x44)
    def ceRecord(id: String, body: Array[Byte]): Array[Byte] = {
      val head = ("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html\r\n" +
        "Content-Encoding: br\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
      WarcSynth.record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:$id>",
        "WARC-Date" -> WarcSynth.Date,
        "WARC-Target-URI" -> s"http://ce.example/$id",
        "Content-Type" -> "application/http; msgtype=response"),
        head ++ body)
    }
    val d = Files.createTempDirectory("warc_ce_lw")
    Files.write(d.resolve("lw.warc"), ceRecord("lw", lwBody))
    val row = spark.read.format("warc").load(d.toString)
      .select("http_content_encoding", "payload").collect()(0)
    assert(row.getString(0) == "br")
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]](1), lwBody),
      "body must pass through raw for downstream routing")
    // corrupt (framing garbage after a valid RFC WBITS) still rejects
    val d2 = Files.createTempDirectory("warc_ce_corrupt")
    Files.write(d2.resolve("c.warc"),
      ceRecord("c", Array[Byte](0x21, 0x7F, 0x7F, 0x7F)))
    val ex = intercept[Exception] {
      spark.read.format("warc").load(d2.toString)
        .select("payload").collect()
    }
    assert(ex.getMessage != null)
  }

  test("decodeContentEncoding=false passes the captured bytes through " +
      "raw (de-chunked but not inflated)") {
    val d = Files.createTempDirectory("warc_ce_raw")
    Files.write(d.resolve("ce.warc"),
      WarcSynth.contentEncodedResponseRecord(0)) // mode 0: plain gzip
    val raw = spark.read.format("warc")
      .option("decodeContentEncoding", "false").load(d.toString)
      .select("payload").collect()(0).getAs[Array[Byte]](0)
    assert(raw.length >= 2 && (raw(0) & 0xFF) == 0x1f &&
      (raw(1) & 0xFF) == 0x8b, "expected raw gzip magic")
    val decoded = new String(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw)).readAllBytes(), "US-ASCII")
    assert(decoded == WarcSynth.htmlOf(0))
  }

  test("a truncated gzip Content-Encoding body rejects instead of " +
      "emitting a half-inflated page") {
    val rec = WarcSynth.contentEncodedResponseRecord(0)
    val s2 = new String(rec, "ISO-8859-1")
    // cut 4 bytes out of the gzip stream, fixing up both lengths so
    // the WARC framing stays valid and only the gzip stream is short
    val bodyStart = s2.indexOf("\r\n\r\n",
      s2.indexOf("Content-Encoding")) + 4
    val warcLenAt = s2.indexOf("Content-Length: ")
    val blockStart = s2.indexOf("\r\n\r\n", warcLenAt) + 4
    val httpHead = s2.substring(blockStart, bodyStart)
    val gzBody = rec.slice(bodyStart, rec.length - 4)
    val cut = gzBody.dropRight(4)
    val newHead = httpHead.replaceFirst("Content-Length: \\d+",
      s"Content-Length: ${cut.length}")
    val newBlock = newHead.getBytes("ISO-8859-1") ++ cut
    val out = WarcSynth.record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:trunc>",
      "WARC-Date" -> WarcSynth.Date,
      "WARC-Target-URI" -> WarcSynth.urlOf(0),
      "Content-Type" -> "application/http; msgtype=response"), newBlock)
    val d = Files.createTempDirectory("warc_ce_trunc")
    Files.write(d.resolve("t.warc"), out)
    intercept[Exception] {
      spark.read.format("warc").load(d.toString)
        .select("payload").collect()
    }
  }

  test("folded WARC header continuations append to the STORED field " +
      "(a folded WARC-Target-URI keeps its continuation text)") {
    val base = WarcSynth.responseRecord(9)
    val s2 = new String(base, "ISO-8859-1")
    val url = WarcSynth.urlOf(9)
    // split the URI across a folded continuation line (WARC 1.1 §4)
    val cutAt = url.length - 6
    val folded = s2.replace("WARC-Target-URI: " + url,
      "WARC-Target-URI: " + url.substring(0, cutAt) + "\r\n  " +
        url.substring(cutAt))
    val d = Files.createTempDirectory("warc_folded")
    Files.write(d.resolve("f.warc"), folded.getBytes("ISO-8859-1"))
    val got = spark.read.format("warc").load(d.toString)
      .select("url").collect()(0).getString(0)
    // continuation joins with a single space (header-fold unfolding)
    assert(got == url.substring(0, cutAt) + " " + url.substring(cutAt),
      s"folded URI mangled: $got")
  }

  test("pushed http_status/content-type predicates skip discarded " +
      "bodies at the second decision point (after HTTP headers, " +
      "before the body read); results stay identical") {
    import org.apache.spark.sql.functions.col
    val dir = fixture(340)
    WarcReadStats.payloadBytesSkipped.reset()
    val df = spark.read.format("warc").load(dir)
      .filter(col("rec_type") === "response" &&
        col("http_status") === 200 &&
        col("http_content_type") === "text/html")
      .select("url", "payload")
    val rows = df.collect()
    // every kept row is a decoded 200 text/html body
    val want = (0 until 340).filter(i => i % 17 != 0 && i % 13 != 5)
    assert(rows.length == want.size)
    // skipped bytes now include the 404 and image RESPONSE bodies
    // (beyond the request/warcinfo blocks the header stage skips)
    val discarded = (0 until 340)
      .filter(i => i % 17 == 0 || i % 13 == 5)
      .map(i => WarcSynth.bodyOf(i.toLong).length).sum
    assert(WarcReadStats.payloadBytesSkipped.sum() >= discarded,
      s"body-stage skip missing: ${WarcReadStats.payloadBytesSkipped.sum()}" +
        s" < $discarded")
    // parity: pushdown disabled returns the same row set
    val plain = spark.read.format("warc").option("pushdown", "false")
      .load(dir)
      .filter(col("rec_type") === "response" &&
        col("http_status") === 200 &&
        col("http_content_type") === "text/html")
      .select("url", "payload").collect()
    assert(plain.map(_.getString(0)).sorted.toSeq ==
      rows.map(_.getString(0)).sorted.toSeq)
  }

  test("the Content-Encoding fixture re-decodes under CPython stdlib " +
      "gzip/zlib (tools/warc_oracle.py ce — independent decoder)") {
    val dir = Files.createTempDirectory("warc_ce_py").toString
    graft.sources.warc.WarcSynth.ensureTwoFileFixture(dir, 120, "ce",
      graft.sources.warc.WarcSynth.contentEncodedResponseRecord)
    val out = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3",
      "/root/repo/tools/warc_oracle.py", "ce", dir, "120"))
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(code == 0 && out.toString.contains("WARC_ORACLE PASS"),
      s"python ce decoder rejected the fixture: $out")
  }

  test("a jumbo record beyond maxRecordBytes rejects with guidance") {
    val d = Files.createTempDirectory("warc_jumbo")
    Files.write(d.resolve("big.warc"), WarcSynth.responseRecord(3))
    val ex = intercept[Exception] {
      spark.read.format("warc").option("maxRecordBytes", "10")
        .load(d.toString).select("payload").collect()
    }
    assert(ex.getMessage.contains("maxRecordBytes") ||
      ex.getCause != null)
  }
}
