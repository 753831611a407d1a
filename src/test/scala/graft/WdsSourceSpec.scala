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

  test("a corrupt shard rejects with a clean error, never misparses") {
    val dir = Files.createTempDirectory("wds_corrupt").toString
    exportSample(dir, n = 5)
    val shard = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).sorted.head
    val bytes = Files.readAllBytes(Paths.get(shard))
    bytes(260) = (bytes(260) ^ 0x55).toByte // inside the first header
    Files.write(Paths.get(shard), bytes)
    val ex = intercept[Exception] {
      spark.read.format("wds").load(dir).count()
    }
    assert(ex.getMessage != null)
  }
}
