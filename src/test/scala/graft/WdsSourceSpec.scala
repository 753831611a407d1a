package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `wds` DSv2 tar-shard format: write-side schema contract, atomic
  * shard commits, entry naming, read-side pruning and corrupt-shard
  * rejection — plus interop: the shards must parse under CPython's
  * stdlib `tarfile` (the reader every real WebDataset loader uses). */
class WdsSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def exportSample(outDir: String, n: Int = 40): Unit = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toString, Array.tabulate[Byte](10 + i)(k => (i * 7 + k).toByte),
        s"caption $i".getBytes("UTF-8"))
    }.toDF("key", "img", "txt")
      .repartition(3)
      .write.format("wds").mode("append").save(outDir)
  }

  test("export -> import round-trips every entry; shard files are " +
      "atomic (no .inprogress leftovers); empty tasks commit valid shards") {
    val dir = Files.createTempDirectory("wds_rt").toString
    exportSample(dir)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString).sorted
    assert(files.count(_.endsWith(".tar")) == 3,
      s"one shard per task expected: ${files.mkString(",")}")
    assert(!files.exists(_.contains("inprogress")))
    val back = spark.read.format("wds").load(dir)
    assert(back.columns.toSeq == Seq("shard", "key", "ext", "data"))
    val rows = back.collect()
      .map(r => (r.getString(1), r.getString(2),
        r.getAs[Array[Byte]](3).toSeq)).toSet
    val want = (0 until 40).flatMap { i =>
      Seq((i.toString, "img",
        Array.tabulate[Byte](10 + i)(k => (i * 7 + k).toByte).toSeq),
        (i.toString, "txt", s"caption $i".getBytes("UTF-8").toSeq))
    }.toSet
    assert(rows == want)
    // column pruning: a key/ext listing plans without the data column
    val pruned = spark.read.format("wds").load(dir).select("key", "ext")
    assert(pruned.queryExecution.executedPlan.toString.contains("key"))
    assert(pruned.distinct().count() == 80)
  }

  test("written shards parse under CPython's stdlib tarfile (the real " +
      "WebDataset loader path)") {
    val dir = Files.createTempDirectory("wds_py").toString
    exportSample(dir, n = 12)
    val shard = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).sorted.head
    val script =
      s"""import tarfile, sys
         |t = tarfile.open('$shard')
         |names = t.getnames()
         |datas = {m.name: t.extractfile(m).read() for m in t.getmembers()}
         |assert all('.' in n for n in names), names
         |for n, d in datas.items():
         |    if n.endswith('.txt'):
         |        assert d == ('caption ' + n.split('.')[0]).encode()
         |print('PY_OK', len(names))
         |""".stripMargin
    val f = Files.createTempFile("wds_check", ".py")
    Files.write(f, script.getBytes("UTF-8"))
    val out = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3", f.toString))
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(code == 0 && out.toString.contains("PY_OK"),
      s"python tarfile rejected the shard: $out")
  }

  test("write-side schema contract: missing key and non-binary columns " +
      "reject; null binary cells are skipped, not written") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wds_schema").toString
    intercept[Exception] {
      Seq((1, "x")).toDF("a", "b").write.format("wds")
        .mode("append").save(dir)
    }
    intercept[Exception] {
      Seq(("k", "not-binary")).toDF("key", "txt").write.format("wds")
        .mode("append").save(dir)
    }
    // empty and dotted keys cannot round-trip the first-dot split
    intercept[Exception] {
      Seq(("", "x".getBytes("UTF-8"))).toDF("key", "txt").coalesce(1)
        .write.format("wds").mode("append")
        .save(Files.createTempDirectory("wds_emptykey").toString)
    }
    // null cell: entry omitted
    val dir2 = Files.createTempDirectory("wds_null").toString
    Seq(("a", "x".getBytes("UTF-8"), null: Array[Byte]),
      ("b", "y".getBytes("UTF-8"), "z".getBytes("UTF-8")))
      .toDF("key", "img", "txt").coalesce(1)
      .write.format("wds").mode("append").save(dir2)
    val names = spark.read.format("wds").load(dir2)
      .selectExpr("concat(key, '.', ext)").collect()
      .map(_.getString(0)).toSet
    assert(names == Set("a.img", "b.img", "b.txt"))
  }

  test("streaming wds ingestion: shards landing in waves stream the " +
      "exact batch entry set, exactly-once via the file-source log") {
    val src = Files.createTempDirectory("wds_stream_src").toString
    exportSample(src, n = 30)
    val land = Files.createTempDirectory("wds_stream_land")
    val shards = Files.list(Paths.get(src)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).sorted
    assert(shards.length == 3)
    val stream = graft.streaming.WdsStream.entries(spark, land.toString)
    val query = stream.writeStream.format("memory")
      .queryName("wds_entries")
      .option("checkpointLocation",
        Files.createTempDirectory("wds_stream_ckpt").toString)
      .outputMode("append").start()
    try {
      // land shard by shard — each wave is its own micro-batch
      shards.foreach { sh =>
        Files.copy(Paths.get(sh),
          land.resolve(Paths.get(sh).getFileName))
        query.processAllAvailable()
      }
      def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getAs[Array[Byte]](3).toSeq)).toSet
      val got = rowsOf(spark.table("wds_entries"))
      val want = rowsOf(spark.read.format("wds").load(land.toString))
      assert(got.nonEmpty && got == want,
        s"stream/batch entry sets differ: ${(want -- got).take(2)}")
      // re-landing an already-admitted shard under the SAME name is a
      // no-op (the admission log); entries are not duplicated
      query.processAllAvailable()
      assert(rowsOf(spark.table("wds_entries")) == want)
    } finally query.stop()
  }

  test("mode(overwrite) truncates: pre-existing shards vanish at batch " +
      "commit; mode(append) keeps them") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wds_ovw").toString
    exportSample(dir, n = 20) // 3 shards, keys 0..19
    def keys(): Set[String] = spark.read.format("wds").load(dir)
      .select("key").distinct().collect().map(_.getString(0)).toSet
    assert(keys() == (0 until 20).map(_.toString).toSet)
    // overwrite with a DIFFERENT key range: old shards must be gone
    (100 until 110).map { i =>
      (i.toString, s"img$i".getBytes("UTF-8"), s"cap$i".getBytes("UTF-8"))
    }.toDF("key", "img", "txt").coalesce(1)
      .write.format("wds").mode("overwrite").save(dir)
    assert(keys() == (100 until 110).map(_.toString).toSet,
      "overwrite must replace, not merge")
    // append on top: both populations visible
    (200 until 205).map { i =>
      (i.toString, s"img$i".getBytes("UTF-8"), s"cap$i".getBytes("UTF-8"))
    }.toDF("key", "img", "txt").coalesce(1)
      .write.format("wds").mode("append").save(dir)
    assert(keys() == ((100 until 110) ++ (200 until 205))
      .map(_.toString).toSet, "append must keep prior shards")
  }

  test("pruned key/ext scan streams past entry payloads without " +
      "materializing them (seam-counted skip bytes)") {
    val dir = Files.createTempDirectory("wds_prune").toString
    exportSample(dir, n = 25)
    graft.sources.wds.WdsReadStats.entriesRead.reset()
    graft.sources.wds.WdsReadStats.payloadBytesSkipped.reset()
    val listing = spark.read.format("wds").load(dir).select("key", "ext")
    // collect, not count — a bare count() is answered from the .widx
    // sidecars without walking at all (its own test below)
    assert(listing.collect().length == 50)
    assert(graft.sources.wds.WdsReadStats.entriesRead.sum() == 50)
    // every img payload is 10+i bytes, every txt "caption i" — all of
    // them must have been SKIPPED, not read
    val wantSkipped = (0 until 25)
      .map(i => (10 + i).toLong + s"caption $i".length).sum
    assert(graft.sources.wds.WdsReadStats.payloadBytesSkipped.sum()
      == wantSkipped,
      s"payload bytes must be skipped on a data-pruned scan")
    // a full scan skips nothing
    graft.sources.wds.WdsReadStats.payloadBytesSkipped.reset()
    spark.read.format("wds").load(dir).select("key", "data").collect()
    assert(graft.sources.wds.WdsReadStats.payloadBytesSkipped.sum() == 0)
    // the same numbers surface as DSv2 custom metrics on the scan node
    val df = spark.read.format("wds").load(dir).select("key", "ext")
    df.collect()
    val m = df.queryExecution.executedPlan.collectLeaves().head.metrics
    assert(m.contains("entriesRead") && m.contains("payloadBytesSkipped"))
    assert(m("entriesRead").value == 50L)
    assert(m("payloadBytesSkipped").value == wantSkipped)
  }

  test("small shards bin-pack into few partitions; a jumbo shard still " +
      "reads green (no shard-size ceiling)") {
    val dir = Files.createTempDirectory("wds_pack").toString
    import spark.implicits._
    (0 until 60).map { i =>
      (i.toString, Array.tabulate[Byte](64)(k => (i + k).toByte))
    }.toDF("key", "blob").repartition(20)
      .write.format("wds").mode("append").save(dir)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .count(_.endsWith(".tar"))
    assert(files == 20, s"expected 20 shards, got $files")
    // an explicit 128 MB target packs all 20 tiny shards into far
    // fewer tasks than one-per-shard (the million-shard-lake shape)
    val packed = spark.read.format("wds")
      .option("maxBytesPerPartition", "128m").load(dir)
    assert(packed.rdd.getNumPartitions <= 2,
      s"bin-packing must combine small shards: " +
        s"${packed.rdd.getNumPartitions} partitions for 20 tiny shards")
    assert(packed.count() == 60)
    // the no-option default is scale-adaptive (BinPack.adaptiveTarget,
    // the FilePartition.maxSplitBytes formula): a lake far smaller than
    // cores x 128 MB spreads toward the cluster's parallelism instead
    // of serializing the decode on 1-2 tasks, and never exceeds
    // one-file-per-task
    val adaptive = spark.read.format("wds").load(dir)
    assert(adaptive.rdd.getNumPartitions > 2 &&
      adaptive.rdd.getNumPartitions <= 20,
      s"adaptive default should spread a tiny lake: " +
        s"got ${adaptive.rdd.getNumPartitions}")
    assert(adaptive.count() == 60)
    // a shard far above a tiny per-partition target gets its own task
    // and reads fine — there is no buffering ceiling to trip
    val single = spark.read.format("wds")
      .option("maxBytesPerPartition", "4k").load(dir)
    assert(single.rdd.getNumPartitions == 20)
    assert(single.count() == 60)
  }

  test("gzip and zstd compressed shards decompress through the codec " +
      "seam and round-trip every entry") {
    val dir = Files.createTempDirectory("wds_codec").toString
    val entries = (0 until 7).map { i =>
      (s"$i.bin", Array.tabulate[Byte](100 + i)(k => (i * 13 + k).toByte))
    }
    val tar = graft.operators.Multimodal.TarCodec.encode(entries)
    val gz = new java.io.ByteArrayOutputStream()
    val gzo = new java.util.zip.GZIPOutputStream(gz)
    gzo.write(tar); gzo.close()
    Files.write(Paths.get(dir, "a.tar.gz"), gz.toByteArray)
    val zst = com.github.luben.zstd.Zstd.compress(tar)
    Files.write(Paths.get(dir, "b.tar.zst"), zst)
    val back = spark.read.format("wds").load(dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Array[Byte]](3).toSeq))
    assert(back.length == 14)
    val byShard = back.groupBy(_._1)
    assert(byShard.keySet == Set("a.tar.gz", "b.tar.zst"))
    byShard.values.foreach { rows =>
      assert(rows.map(r => (r._2, r._3)).toSet ==
        entries.map(e => (e._1.stripSuffix(".bin"), e._2.toSeq)).toSet)
    }
    // pruned scans on codec shards also skip (decompress-and-discard)
    graft.sources.wds.WdsReadStats.payloadBytesSkipped.reset()
    spark.read.format("wds").load(dir).select("key").collect()
    assert(graft.sources.wds.WdsReadStats.payloadBytesSkipped.sum() ==
      2L * entries.map(_._2.length).sum)
  }

  test("key/ext split at the FIRST dot of the basename (WebDataset " +
      "compound extensions)") {
    val dir = Files.createTempDirectory("wds_firstdot").toString
    val tar = graft.operators.Multimodal.TarCodec.encode(Seq(
      ("sample.seg.png", Array[Byte](1, 2)),
      ("plain.txt", Array[Byte](3)),
      ("noext", Array[Byte](4))))
    Files.write(Paths.get(dir, "s.tar"), tar)
    val got = spark.read.format("wds").load(dir)
      .select("key", "ext").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("sample", "seg.png"), ("plain", "txt"),
      ("noext", "")))
  }

  test("the sink rejects keys containing '.' or '/' (they would not " +
      "round-trip under the first-dot convention)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wds_badkey").toString
    val ex = intercept[Exception] {
      Seq(("a.b", "x".getBytes("UTF-8"))).toDF("key", "txt")
        .coalesce(1).write.format("wds").mode("append").save(dir)
    }
    assert(ex.getMessage != null)
  }

  test("shard names are unique per write job: a second append never " +
      "reuses (and can never silently replace) the first job's names") {
    val dir = Files.createTempDirectory("wds_jobtag").toString
    exportSample(dir, n = 6)
    val first = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).toSet
    exportSample(dir, n = 6)
    val second = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).toSet -- first
    assert(first.nonEmpty && second.nonEmpty && (first & second).isEmpty)
    // the job tag (shard-<tag>-...) differs between the two writes
    def tags(s: Set[String]) = s.map(p =>
      Paths.get(p).getFileName.toString.split("-")(1))
    assert((tags(first) & tags(second)).isEmpty,
      s"job tags must differ: ${tags(first)} vs ${tags(second)}")
    // both populations read back
    assert(spark.read.format("wds").load(dir)
      .select("key").distinct().count() == 6)
  }

  test("overwrite's truncate sweep preserves '_'-prefixed marker files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wds_marker").toString
    exportSample(dir, n = 4)
    Files.write(Paths.get(dir, "_SUCCESS"), Array.emptyByteArray)
    (0 until 2).map(i => (s"n$i", s"v$i".getBytes("UTF-8")))
      .toDF("key", "txt").coalesce(1)
      .write.format("wds").mode("overwrite").save(dir)
    assert(Files.exists(Paths.get(dir, "_SUCCESS")),
      "truncate must not delete marker files the reader ignores")
    assert(spark.read.format("wds").load(dir)
      .select("key").distinct().count() == 2)
  }

  test("shard rolling: maxCount/maxSize split a task's output into " +
      "sequence-suffixed shards, samples never split, atomic at commit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wds_roll").toString
    (0 until 50).map { i =>
      (f"k$i%03d", Array.tabulate[Byte](100)(k => (i + k).toByte),
        s"cap $i".getBytes("UTF-8"))
    }.toDF("key", "img", "txt").coalesce(1)
      .write.format("wds").option("maxCount", "12")
      .mode("append").save(dir)
    val names = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).map(p => Paths.get(p).getFileName.toString)
      .sorted
    assert(names.length == 5, s"50 samples / 12 per shard -> 5 shards: " +
      names.mkString(","))
    assert(!names.exists(_.contains("inprogress")))
    // seq 0 keeps the plain name; rolled shards carry -sNNNNN
    assert(names.count(_.matches("shard-[0-9a-f]{8}-\\d{5}-\\d+\\.tar")) == 1)
    assert(names.count(_.matches(
      "shard-[0-9a-f]{8}-\\d{5}-\\d+-s\\d{5}\\.tar")) == 4)
    val back = spark.read.format("wds").load(dir)
    assert(back.count() == 100) // 50 keys x 2 entries
    // every sample's entries live in ONE shard (the WebDataset
    // grouping contract), and each shard holds <= 12 samples
    val perKey = back.groupBy("key")
      .agg(org.apache.spark.sql.functions.countDistinct("shard").as("ns"))
      .collect()
    assert(perKey.length == 50 && perKey.forall(_.getLong(1) == 1L))
    val perShard = back.select("shard", "key").distinct()
      .groupBy("shard").count().collect()
    assert(perShard.forall(_.getLong(1) <= 12))
    // size-based rolling: tiny maxSize -> one sample per shard
    val dir2 = Files.createTempDirectory("wds_rollsz").toString
    (0 until 6).map { i =>
      (s"k$i", Array.tabulate[Byte](600)(k => (i + k).toByte))
    }.toDF("key", "img").coalesce(1)
      .write.format("wds").option("maxSize", "2000")
      .mode("append").save(dir2)
    val n2 = Files.list(Paths.get(dir2)).toArray
      .count(_.toString.endsWith(".tar"))
    assert(n2 == 6, s"600B+header samples under a 2000B cap must roll " +
      s"one per shard, got $n2")
    assert(spark.read.format("wds").load(dir2).count() == 6)
  }

  test("a pushed ext filter skips non-matching payloads during the " +
      "walk, even when data is selected; filters stay residual") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wds_filter").toString
    (0 until 20).map { i =>
      (i.toString, Array.tabulate[Byte](400)(k => (i + k).toByte),
        s"cap $i".getBytes("UTF-8"))
    }.toDF("key", "img", "txt").coalesce(2)
      .write.format("wds").mode("append").save(dir)
    graft.sources.wds.WdsReadStats.payloadBytesSkipped.reset()
    val caps = spark.read.format("wds").load(dir)
      .filter($"ext" === "txt").select("key", "data")
    assert(caps.queryExecution.executedPlan.toString
      .contains("pushedFilters=[EqualTo(ext,txt)"),
      "the ext filter must reach the scan")
    val rows = caps.collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1),
        "UTF-8"))).toMap
    assert(rows == (0 until 20).map(i => i.toString -> s"cap $i").toMap)
    // every img payload (400 B x 20) was skipped, never materialized
    assert(graft.sources.wds.WdsReadStats.payloadBytesSkipped.sum()
      == 400L * 20)
    // pushdown-disabled parity
    val slow = spark.read.format("wds").option("pushdown", "false")
      .load(dir).filter($"ext" === "txt").select("key", "data").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1),
        "UTF-8"))).toMap
    assert(slow == rows)
    // the residual re-check keeps semantics for unsupported filters too
    assert(spark.read.format("wds").load(dir)
      .filter(org.apache.spark.sql.functions.length($"data") > 100)
      .count() == 20)
  }

  test("multi-path load survives a comma in a directory name (the " +
      "'paths' option is parsed as real JSON, not split on commas)") {
    val base = Files.createTempDirectory("wds_json")
    val d1 = Files.createDirectory(base.resolve("part,one")).toString
    val d2 = Files.createDirectory(base.resolve("two")).toString
    import spark.implicits._
    Seq(("a", "1".getBytes("UTF-8"))).toDF("key", "txt").coalesce(1)
      .write.format("wds").mode("append").save(d1)
    Seq(("b", "2".getBytes("UTF-8"))).toDF("key", "txt").coalesce(1)
      .write.format("wds").mode("append").save(d2)
    val keys = spark.read.format("wds").load(d1, d2)
      .select("key").collect().map(_.getString(0)).toSet
    assert(keys == Set("a", "b"))
    // same discipline on the pcap source (shared PathOptions parser)
    val p1 = Files.createDirectory(base.resolve("cap,dir"))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(
      "src/test/resources/test.pcap"))
    Files.write(p1.resolve("a.pcap"), bytes)
    val capPath = p1.resolve("a.pcap").toString
    assert(spark.read.format("pcap").load(capPath, capPath).count() == 2)
  }

  test("In and StartsWith predicates push too, and conjunctions " +
      "compose (each conjunct arrives as its own filter)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wds_filter2").toString
    (0 until 12).map { i =>
      (s"k$i", Array.tabulate[Byte](200)(k => (i + k).toByte),
        s"c$i".getBytes("UTF-8"))
    }.toDF("key", "img", "txt").coalesce(1)
      .write.format("wds").mode("append").save(dir)
    val in2 = spark.read.format("wds").load(dir)
      .filter($"ext".isin("txt", "img") && $"key".startsWith("k1"))
      .select("key", "ext")
    val plan = in2.queryExecution.executedPlan.toString
    assert(plan.contains("In(ext,") && plan.contains("StringStartsWith(key,k1)"),
      s"expected pushed In + StartsWith in:\n$plan")
    val got = in2.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("k1", "img"), ("k1", "txt"), ("k10", "img"),
      ("k10", "txt"), ("k11", "img"), ("k11", "txt")))
  }

  test("fuzzed tar headers reject or parse, never hang or misallocate " +
      "(seeded random header mutations)") {
    val dir = Files.createTempDirectory("wds_fuzz").toString
    val entries = (0 until 6).map { i =>
      (s"$i.bin", Array.tabulate[Byte](50 + i * 17)(k => (i + k).toByte))
    }
    val good = graft.operators.Multimodal.TarCodec.encode(entries)
    // the actual header offsets (payload blocks are 512-aligned too,
    // and payload mutations are undetectable by design — tar has no
    // payload checksum — so the fuzz targets genuine headers)
    val hdrOffs = entries.scanLeft(0L) { case (off, (_, data)) =>
      off + 512 + ((data.length + 511L) / 512) * 512
    }.init
    val rnd = new scala.util.Random(1234)
    var rejected = 0
    for (trial <- 0 until 300) {
      val mut = good.clone()
      val nMut = rnd.nextInt(4) + 1
      for (_ <- 0 until nMut) {
        val hdrBase = hdrOffs(rnd.nextInt(hdrOffs.length)).toInt
        mut(hdrBase + rnd.nextInt(512)) =
          (rnd.nextInt(256) - 128).toByte
      }
      Files.write(Paths.get(dir, "fuzz.tar"), mut)
      try {
        val rows = spark.read.format("wds")
          .load(Paths.get(dir, "fuzz.tar").toString)
          .collect()
        // a surviving parse must stay within the original byte budget
        assert(rows.length <= entries.length * 2)
        rows.foreach { r =>
          assert(r.getAs[Array[Byte]](3).length <= good.length)
        }
      } catch {
        case _: Exception => rejected += 1 // clean rejection
      }
    }
    // the checksum makes nearly all header mutations detectable
    assert(rejected > 250, s"only $rejected/300 rejected")
  }

  test("a mid-commit rename failure aborts cleanly: already-renamed " +
      "shards (and sidecars) are removed, so a task retry cannot " +
      "duplicate samples") {
    val dir = Files.createTempDirectory("wds_midfail").toString
    val conf = spark.sessionState.newHadoopConf()
    // the SECOND rolled shard's final name already exists (another
    // job's data) -> commit renames shard 1, then throws on shard 2
    Files.write(Paths.get(dir, "shard-test-00000-1-s00001.tar"),
      "other job".getBytes("UTF-8"))
    val w = new graft.sources.wds.WdsShardWriter(dir,
      "shard-test-00000-1", 0, Seq(("txt", 1)), conf,
      replaceOnCommit = false, maxCount = 1)
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.InternalRow
    (0 until 3).foreach { i =>
      w.write(InternalRow(UTF8String.fromString(s"k$i"),
        s"v$i".getBytes("UTF-8")))
    }
    intercept[java.io.IOException] { w.commit() }
    w.abort() // what Spark does after a failed commit
    val left = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .map(p => Paths.get(p).getFileName.toString).sorted
    assert(left.toSeq == Seq("shard-test-00000-1-s00001.tar"),
      s"only the foreign file may survive the abort: ${left.mkString(",")}")
  }

  test("foreign tar shards: PAX/global/dir/longname entries are " +
      "skipped, and POSIX prefix-split long paths reassemble") {
    val dir = Files.createTempDirectory("wds_foreign").toString
    def hdr(name: String, prefix: String, size: Int,
        typeflag: Byte): Array[Byte] = {
      val h = new Array[Byte](512)
      def put(s: String, off: Int): Unit = {
        val b = s.getBytes("US-ASCII")
        System.arraycopy(b, 0, h, off, b.length)
      }
      put(name, 0)
      put("0000644", 100); put("0000000", 108); put("0000000", 116)
      put(f"$size%011o", 124)
      put("00000000000", 136)
      h(156) = typeflag
      put("ustar", 257); put("00", 263)
      put(prefix, 345)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      h.foreach(b => sum += b & 0xFF)
      put(f"$sum%06o", 148); h(154) = 0; h(155) = ' '
      h
    }
    def padded(data: Array[Byte]): Array[Byte] =
      java.util.Arrays.copyOf(data, ((data.length + 511) / 512) * 512)
    val out = new java.io.ByteArrayOutputStream()
    // a PAX extended header ('x'), a global one ('g'), a directory
    // ('5'), a GNU longname block ('L') — none is sample data
    val pax = "27 path=ignored/by/reader\n".getBytes("US-ASCII")
    out.write(hdr("./PaxHeaders/s1.txt", "", pax.length, 'x'))
    out.write(padded(pax))
    out.write(hdr("pax_global_header", "", pax.length, 'g'))
    out.write(padded(pax))
    out.write(hdr("some/dir/", "", 0, '5'))
    out.write(hdr("././@LongLink", "", 8, 'L'))
    out.write(padded("longname".getBytes("US-ASCII")))
    // a >100-char path split across prefix+name (POSIX ustar)
    val p1 = "hello-prefixed".getBytes("US-ASCII")
    out.write(hdr("s1.txt", "deep/nested/dir", p1.length, '0'))
    out.write(padded(p1))
    // a plain regular entry, NUL typeflag (old-style regular file)
    val p2 = "plain".getBytes("US-ASCII")
    out.write(hdr("s2.txt", "", p2.length, 0.toByte))
    out.write(padded(p2))
    out.write(new Array[Byte](1024)) // end marker
    Files.write(Paths.get(dir, "foreign.tar"), out.toByteArray)
    val rows = spark.read.format("wds").load(dir)
      .collect()
      .map(r => (r.getString(1), r.getString(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8"))).toSet
    assert(rows == Set(
      ("deep/nested/dir/s1", "txt", "hello-prefixed"),
      ("s2", "txt", "plain")),
      s"foreign entries leaked or prefix lost: $rows")
  }

  test("streaming-writer tmp paths are attempt-unique: a zombie " +
      "attempt of the same (job, epoch, partition) never interleaves " +
      "bytes into the committed attempt's tmp file") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val dir = Files.createTempDirectory("wds_zombie").toString
    val conf = spark.sessionState.newHadoopConf()
    def writer(task: Long) = new graft.sources.wds.WdsShardWriter(dir,
      "shard-j-e000001-p00000", 0, Seq(("txt", 1)), conf,
      replaceOnCommit = true, tmpTag = s".t$task")
    val a = writer(1)
    val b = writer(2) // speculative/zombie attempt, interleaved writes
    a.write(InternalRow(UTF8String.fromString("ka"),
      "from-a".getBytes("UTF-8")))
    b.write(InternalRow(UTF8String.fromString("kb"),
      "from-b".getBytes("UTF-8")))
    a.commit() // the commit coordinator picked attempt 1
    b.abort()
    val got = spark.read.format("wds").load(dir).collect()
      .map(r => (r.getString(1), new String(r.getAs[Array[Byte]](3),
        "UTF-8"))).toSet
    assert(got == Set(("ka", "from-a")),
      s"zombie bytes reached the committed shard: $got")
    assert(!Files.list(Paths.get(dir)).toArray.map(_.toString)
      .exists(_.contains("inprogress")))
  }

  test("an epoch replay that rolls into FEWER shards sweeps the " +
      "earlier attempt's higher-sequence shards (no duplicated samples)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val dir = Files.createTempDirectory("wds_shrink").toString
    val conf = spark.sessionState.newHadoopConf()
    val base = "shard-j-e000002-p00000"
    // first (crashed-after-task-commit) attempt: maxCount=1 -> 3 shards
    val w1 = new graft.sources.wds.WdsShardWriter(dir, base, 0,
      Seq(("txt", 1)), conf, replaceOnCommit = true, maxCount = 1,
      tmpTag = ".t1")
    (0 until 3).foreach(i => w1.write(InternalRow(
      UTF8String.fromString(s"k$i"), s"v$i".getBytes("UTF-8"))))
    w1.commit()
    assert(Files.list(Paths.get(dir)).toArray.map(_.toString)
      .count(_.endsWith(".tar")) == 3)
    // the replay packs the same rows into ONE shard (no rolling)
    val w2 = new graft.sources.wds.WdsShardWriter(dir, base, 0,
      Seq(("txt", 1)), conf, replaceOnCommit = true, tmpTag = ".t2")
    (0 until 3).foreach(i => w2.write(InternalRow(
      UTF8String.fromString(s"k$i"), s"v$i".getBytes("UTF-8"))))
    w2.commit()
    val keys = spark.read.format("wds").load(dir).collect()
      .map(_.getString(1)).sorted.toSeq
    assert(keys == Seq("k0", "k1", "k2"),
      s"replay left duplicated samples: $keys")
    assert(Files.list(Paths.get(dir)).toArray.map(_.toString)
      .count(_.endsWith(".tar")) == 1)
  }

  test("the ingestion stream admits compressed shards (the batch/" +
      "stream glob asymmetry): a gzip shard streams its entries too") {
    import java.util.zip.GZIPOutputStream
    val src = Files.createTempDirectory("wds_gzstream_src").toString
    exportSample(src, n = 10)
    val land = Files.createTempDirectory("wds_gzstream_land")
    val shards = Files.list(Paths.get(src)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).sorted
    // first shard lands plain, second lands gzip-compressed
    Files.copy(Paths.get(shards.head),
      land.resolve(Paths.get(shards.head).getFileName))
    val gzName = Paths.get(shards(1)).getFileName.toString + ".gz"
    val gz = new GZIPOutputStream(
      Files.newOutputStream(land.resolve(gzName)))
    gz.write(Files.readAllBytes(Paths.get(shards(1))))
    gz.close()
    val query = graft.streaming.WdsStream.entries(spark, land.toString)
      .writeStream.format("memory").queryName("wds_gz_entries")
      .option("checkpointLocation",
        Files.createTempDirectory("wds_gzstream_ckpt").toString)
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(1), r.getString(2),
          r.getAs[Array[Byte]](3).toSeq)).toSet
      val got = rowsOf(spark.table("wds_gz_entries"))
      val want = rowsOf(spark.read.format("wds").load(land.toString))
      assert(got == want, s"stream/batch sets differ: ${(want -- got).take(2)}")
      val shards2 = spark.table("wds_gz_entries").select("shard")
        .distinct().collect().map(_.getString(0)).toSet
      assert(shards2.exists(_.endsWith(".tar.gz")),
        s"compressed shard missing from the stream: $shards2")
    } finally query.stop()
  }

  test("the scan reports real statistics to Catalyst: summed shard " +
      "bytes, and the EXACT row count from .widx sidecars") {
    val dir = Files.createTempDirectory("wds_stats").toString
    exportSample(dir, n = 15) // 15 docs x 2 entries, sidecars written
    spark.read.format("wds").load(dir).count() // session init
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", dir))
    val scan = new graft.sources.wds.WdsScanBuilder(opts).build()
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics]
    val stats = scan.estimateStatistics()
    val want = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).map(f => Files.size(Paths.get(f))).sum
    assert(stats.sizeInBytes.getAsLong == want)
    assert(stats.numRows.getAsLong == 30, "sidecar row count")
    // a sidecar-less shard declines the row count, size still reported
    Files.write(Paths.get(dir, "foreign.tar"),
      graft.operators.Multimodal.TarCodec.encode(
        Seq(("x.bin", Array[Byte](1, 2, 3)))))
    val stats2 = new graft.sources.wds.WdsScanBuilder(opts).build()
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics].estimateStatistics()
    assert(!stats2.numRows.isPresent)
    assert(stats2.sizeInBytes.getAsLong > want)
  }

  test("a corrupt shard rejects with a clean error, never misparses") {
    val dir = Files.createTempDirectory("wds_corrupt").toString
    exportSample(dir, n = 5)
    val shard = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).sorted.head
    val bytes = Files.readAllBytes(Paths.get(shard))
    bytes(260) = (bytes(260) ^ 0x55).toByte // inside the first header
    Files.write(Paths.get(shard), bytes)
    // collect() forces the real walk (a bare count() would answer from
    // the .widx sidecars and never touch the corrupt bytes)
    val ex = intercept[Exception] {
      spark.read.format("wds").load(dir).select("key", "data").collect()
    }
    assert(ex.getMessage != null)
  }

  test("COUNT(*) answers from .widx sidecars without walking a shard; " +
      "a sidecar-less shard or countPushdown=false falls back") {
    val dir = Files.createTempDirectory("wds_cnt").toString
    exportSample(dir, n = 15) // 30 entries over 3 shards
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val fast = spark.read.format("wds").load(dir).groupBy().count()
    assert(planOf(fast).contains("WdsStatsScan"),
      s"expected metadata count scan in:\n${planOf(fast)}")
    graft.sources.wds.WdsReadStats.entriesRead.reset()
    assert(fast.collect().head.getLong(0) == 30)
    assert(graft.sources.wds.WdsReadStats.entriesRead.sum() == 0,
      "metadata count must not walk any entries")
    // parity the slow way
    val slow = spark.read.format("wds").option("countPushdown", "false")
      .load(dir).groupBy().count()
    assert(!planOf(slow).contains("WdsStatsScan"))
    assert(slow.collect().head.getLong(0) == 30)
    // a shard without a sidecar (foreign tar) declines the pushdown
    val foreign = graft.operators.Multimodal.TarCodec.encode(
      Seq(("x.bin", Array[Byte](1))))
    Files.write(Paths.get(dir, "foreign.tar"), foreign)
    val mixed = spark.read.format("wds").load(dir).groupBy().count()
    assert(!planOf(mixed).contains("WdsStatsScan"))
    assert(mixed.collect().head.getLong(0) == 31)
    // overwrite sweeps stale sidecars with their shards: counts stay
    // consistent after a replace
    import spark.implicits._
    Seq(("z", "v".getBytes("UTF-8"))).toDF("key", "txt").coalesce(1)
      .write.format("wds").mode("overwrite").save(dir)
    val after = spark.read.format("wds").load(dir).groupBy().count()
    assert(planOf(after).contains("WdsStatsScan"),
      "post-overwrite dir must be fully indexed again")
    assert(after.collect().head.getLong(0) == 1)
  }
}
