package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in byte-range splitting of big plain `.tar` shards with
  * 512-block header resync ([[graft.sources.wds.WdsResync]]): rows
  * must match the whole-file walk exactly, entries owned by header
  * block, cuts inside payloads harmless. */
class WdsResyncSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** One plain tar with n samples of (txt, bin) entries, varied
    * payload sizes so cuts land everywhere. */
  private def shard(n: Int): String = {
    val d = Files.createTempDirectory("wds_resync")
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until n).map { i =>
      val body = new Array[Byte](64 + rnd.nextInt(4000))
      rnd.nextBytes(body)
      (f"sample$i%05d", body)
    }
    rows.toDF("key", "bin").coalesce(1)
      .sortWithinPartitions("key")
      .write.format("wds").mode("append").save(d.toString)
    // the wds sink writes .tar shards; find the single one
    val tars = new java.io.File(d.toString).listFiles()
      .filter(_.getName.endsWith(".tar"))
    assert(tars.length == 1, tars.mkString(","))
    d.toString
  }

  test("a big plain .tar splits under resyncSplit=true with rows " +
      "identical to the whole-file walk; default stays whole-file") {
    val dir = shard(400)
    def scan(resync: Boolean) = spark.read.format("wds")
      .option("maxBytesPerPartition", "64k")
      .option("resyncSplit", resync.toString)
      .load(dir)
    val split = scan(resync = true)
    assert(split.rdd.getNumPartitions > 4,
      s"got ${split.rdd.getNumPartitions}")
    val whole = scan(resync = false)
    assert(whole.rdd.getNumPartitions == 1,
      "resync must stay opt-in (tar-in-tar payload caveat)")
    def key(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions._
      df.select(col("key"), col("ext"), md5(col("data")).as("m"))
        .collect().map(_.toString).sorted.toSeq
    }
    val a = key(split)
    val b = key(whole)
    assert(a.length == b.length && a == b,
      s"resync rows diverge: ${a.length} vs ${b.length}")
  }

  test("tiny ranges (every cut mid-entry) still lose/duplicate " +
      "nothing") {
    val dir = shard(80)
    val df = spark.read.format("wds")
      .option("maxBytesPerPartition", "4k")
      .option("resyncSplit", "true").load(dir)
    assert(df.rdd.getNumPartitions >= 8)
    val keys = df.select("key", "ext").collect()
      .map(r => r.getString(0) + "." + r.getString(1))
    assert(keys.length == keys.distinct.length, "duplicated entries")
    assert(keys.length == 80, s"lost entries: ${keys.length} of 80")
  }
}
