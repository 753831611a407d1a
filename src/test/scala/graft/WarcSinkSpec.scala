package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.warc.{WarcCdx, WarcSynth}

/** The `warc` DSv2 SINK: member-per-record gzip export, HTTP block
  * synthesis, atomic commits, `.wcdx` sidecars born at commit,
  * overwrite sweep, schema validation. */
class WarcSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def docsDf(n: Int) = {
    import spark.implicits._
    spark.range(n.toLong).select(
      concat(lit("http://sink.example/d/"), $"id").as("url"),
      lit(200).as("http_status"),
      lit("text/plain").as("http_content_type"),
      encode(concat(lit("document body "), $"id"), "UTF-8")
        .as("payload"))
  }

  test("export -> scan round-trips every payload byte; the exported " +
      "lake is born with fresh .wcdx sidecars (COUNT(*) from " +
      "metadata, range splits for free)") {
    val dir = Files.createTempDirectory("warc_sink").toString
    docsDf(500).repartition(4).write.format("warc").mode("append").save(dir)
    val parts = Files.list(Paths.get(dir)).toArray.map(_.toString)
    val data = parts.filter(_.endsWith(".warc.gz"))
    assert(data.nonEmpty && data.length <= 4)
    assert(parts.count(_.endsWith(".wcdx")) == data.length,
      "every part must carry its sidecar")
    assert(!parts.exists(_.contains(".inprogress")),
      "no in-progress temp may survive a commit")
    // read-back parity
    val back = spark.read.format("warc").load(dir)
      .select(
        regexp_extract(col("url"), "/d/(\\d+)$", 1).cast("long")
          .as("id"),
        col("http_status"),
        col("payload").cast("string").as("body"))
      .collect()
    assert(back.length == 500)
    back.foreach { r =>
      assert(r.getInt(1) == 200)
      assert(r.getString(2) == s"document body ${r.getLong(0)}")
    }
    // the sink's sidecars serve the metadata COUNT(*) directly
    graft.sources.warc.WarcReadStats.recordsRead.reset()
    assert(spark.read.format("warc").load(dir).count() == 500)
    assert(graft.sources.warc.WarcReadStats.recordsRead.sum() == 0,
      "count should come from the sink-written sidecars")
    // and a pushed point-lookup plans a pruned slice from them
    val one = spark.read.format("warc").load(dir)
      .filter(col("url") === "http://sink.example/d/123")
      .select("url", "payload")
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == 1)
  }

  test("non-HTTP records (no http_status column) write the payload " +
      "as the raw block with the contentType option") {
    val dir = Files.createTempDirectory("warc_sink_raw").toString
    import spark.implicits._
    spark.range(20L).select(
      concat(lit("http://sink.example/raw/"), $"id").as("url"),
      lit("metadata").as("rec_type"),
      encode(concat(lit("{\"k\":"), $"id", lit("}")), "UTF-8")
        .as("payload"))
      .coalesce(1)
      .write.format("warc").mode("append").option("container", "warc")
      .option("contentType", "application/json").save(dir)
    val rows = spark.read.format("warc").load(dir)
      .select("rec_type", "content_type", "http_status", "payload")
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getString(0) == "metadata")
      assert(r.getString(1) == "application/json")
      assert(r.isNullAt(2))
      assert(new String(r.getAs[Array[Byte]](3), "UTF-8")
        .startsWith("{\"k\":"))
    }
    // plain container round-trips under the CPython decoder's grammar
    // expectations too: just re-index and survey it
    val f = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".warc")).head
    assert(WarcCdx.readOffsets(
      new org.apache.hadoop.fs.Path(f).getFileSystem(
        spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(f).getFileSystem(
        spark.sessionState.newHadoopConf())
        .getFileStatus(new org.apache.hadoop.fs.Path(f))).get
      ._2.length == 20)
  }

  test("mode overwrite sweeps stale data files AND their sidecars, " +
      "preserving '_'-prefixed markers") {
    val dir = Files.createTempDirectory("warc_sink_ow").toString
    docsDf(50).coalesce(1).write.format("warc").mode("append").save(dir)
    Files.write(Paths.get(dir, "_MARKER"), Array.empty[Byte])
    val before = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".warc.gz"))
    assert(before.length == 1)
    docsDf(30).coalesce(2).write.format("warc").mode("overwrite")
      .save(dir)
    val after = Files.list(Paths.get(dir)).toArray
      .map(p => Paths.get(p.toString).getFileName.toString)
    assert(!after.contains(Paths.get(before.head).getFileName.toString),
      "stale shard survived overwrite")
    assert(!after.contains(
      Paths.get(before.head).getFileName.toString + ".wcdx"),
      "stale sidecar survived overwrite")
    assert(after.contains("_MARKER"), "marker swept")
    assert(spark.read.format("warc").load(dir).count() == 30)
  }

  test("schema validation: missing url/payload or mistyped columns " +
      "reject before any file is written") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warc_sink_bad").toString
    intercept[Exception] {
      spark.range(3L).select($"id".cast("string").as("url"))
        .write.format("warc").mode("append").save(dir)
    }
    intercept[Exception] {
      spark.range(3L).select($"id".cast("string").as("url"),
        $"id".cast("string").as("payload")) // payload must be BINARY
        .write.format("warc").mode("append").save(dir)
    }
    assert(Files.list(Paths.get(dir)).toArray
      .forall(p => p.toString.endsWith("bad")), "no files expected")
  }

  test("STREAMING sink: epochs land as epoch-keyed archives with " +
      "sidecars; a checkpoint restart replays without duplicating a " +
      "record") {
    import org.apache.spark.sql.functions.col
    val stage = Files.createTempDirectory("warc_ss_stage").toString
    val outDir = Files.createTempDirectory("warc_ss_out").toString
    val ckpt = Files.createTempDirectory("warc_ss_ckpt").toString
    val src = docsDf(120)
    src.repartition(3).write.mode("overwrite").parquet(stage)
    def startQuery() = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
      .writeStream.format("warc")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    // run, stop, and RESTART from the same checkpoint — the epoch
    // after the restart may replay; epoch-keyed names must replace,
    // not duplicate
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val files = Files.list(Paths.get(outDir)).toArray.map(_.toString)
    assert(files.exists(_.contains("-e000000-")),
      "expected epoch-keyed archive names")
    assert(files.count(_.endsWith(".warc.gz")) ==
      files.count(_.endsWith(".wcdx")),
      "every epoch archive needs its sidecar")
    assert(!files.exists(_.contains(".inprogress")))
    val back = spark.read.format("warc").load(outDir)
      .select(col("url")).collect().map(_.getString(0))
    assert(back.length == 120, s"expected 120 records, got ${back.length}")
    assert(back.toSet.size == 120, "duplicated records after restart")
  }

  test("the sink-written bytes re-parse under the CPython stdlib " +
      "decoder (gzip + ISO 28500 grammar)") {
    // the python oracle checks the SYNTH fixture's formulas; here we
    // only need grammar-level interop, so re-walk the sink's output
    // through the synth-independent MemberGzipWalker + record grammar
    val dir = Files.createTempDirectory("warc_sink_py").toString
    docsDf(40).coalesce(1).write.format("warc").mode("append").save(dir)
    val f = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".warc.gz")).head
    val walker = new WarcCdx.MemberGzipWalker(
      Files.newInputStream(Paths.get(f)))
    var members = 0
    while (walker.next()) {
      members += 1
      val s = new String(walker.payload, "ISO-8859-1")
      assert(s.startsWith("WARC/1.0\r\n"), "member must start a record")
      assert(s.contains("WARC-Target-URI: http://sink.example/d/"))
    }
    assert(members == 40)
  }

  test("empty partitions commit NO archive, batch AND streaming — a " +
      "0-byte .warc.gz is not a valid gzip stream, so a placeholder " +
      "file would crash any unfiltered read of the sink's output") {
    // batch: more partitions than rows
    val bdir = Files.createTempDirectory("warc_sink_eb").toString
    docsDf(2).repartition(6).write.format("warc").mode("append")
      .save(bdir)
    val bfiles = Files.list(Paths.get(bdir)).toArray.map(_.toString)
      .filter(_.endsWith(".warc.gz"))
    assert(bfiles.nonEmpty && bfiles.forall(f =>
      Files.size(Paths.get(f)) > 0), "batch committed an empty archive")
    assert(spark.read.format("warc").load(bdir).count() == 2)
    // streaming: repartition(5) over 2 rows leaves empty partitions
    // in the epoch — exactly the shape that used to land 0-byte files
    val stage = Files.createTempDirectory("warc_se_stage").toString
    val outDir = Files.createTempDirectory("warc_se_out").toString
    val ckpt = Files.createTempDirectory("warc_se_ckpt").toString
    val src = docsDf(2)
    src.write.mode("overwrite").parquet(stage)
    val q = spark.readStream.schema(src.schema).parquet(stage)
      .repartition(5)
      .writeStream.format("warc")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val sfiles = Files.list(Paths.get(outDir)).toArray.map(_.toString)
      .filter(_.endsWith(".warc.gz"))
    assert(sfiles.nonEmpty && sfiles.forall(f =>
      Files.size(Paths.get(f)) > 0),
      "streaming sink committed a 0-byte archive")
    // the read that used to crash (GZIPInputStream EOF on the 0-byte
    // placeholder): unfiltered scan of the sink's output directory
    assert(spark.read.format("warc").load(outDir)
      .select("url").collect().length == 2)
  }

  test("header values are validated BEFORE any byte is emitted: " +
      "CR/LF injection and non-ASCII values fail the task instead of " +
      "writing a corrupt record") {
    import spark.implicits._
    def rootChain(t: Throwable): String = {
      val sb = new StringBuilder
      var c: Throwable = t
      while (c != null) { sb.append(c.getMessage).append(' '); c = c.getCause }
      sb.toString
    }
    val dir = Files.createTempDirectory("warc_sink_inject").toString
    // a CRLF in the url would inject/override header fields on
    // read-back (setField is last-wins); non-ASCII would be silently
    // mangled to '?' by the US-ASCII encode
    for (url <- Seq("http://a.example/\r\nWARC-Type: warcinfo",
        "http://b.example/éclair")) {
      val e = intercept[Exception] {
        Seq((url, "body".getBytes("UTF-8"))).toDF("url", "payload")
          .coalesce(1).write.format("warc").mode("append").save(dir)
      }
      assert(rootChain(e).contains("printable ASCII"),
        s"expected a header-validation failure for $url")
    }
    // failed tasks abort cleanly: no data file, no temp survives
    val leftover = Files.list(Paths.get(dir)).toArray.map(_.toString)
    assert(!leftover.exists(_.endsWith(".warc.gz")),
      "a rejected row must not leave a visible archive")
    // printable-ASCII urls (including '"') still write fine
    Seq(("http://ok.example/\"quoted\"?q=1&x=%C3%A9",
        "body".getBytes("UTF-8"))).toDF("url", "payload")
      .coalesce(1).write.format("warc").mode("append").save(dir)
    assert(spark.read.format("warc").load(dir).count() == 1)
  }
}
