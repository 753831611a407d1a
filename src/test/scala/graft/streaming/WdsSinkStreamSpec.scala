package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming `wds` sink: a continuously-curated corpus lands as
  * tar shards per micro-batch — epoch-keyed shard names, atomic
  * renames, and idempotent replay across a checkpoint restart
  * (exactly-once output for deterministic input). */
class WdsSinkStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def readBack(dir: String): Set[(String, String, Seq[Byte])] =
    spark.read.format("wds").load(dir).collect()
      .map(r => (r.getString(1), r.getString(2),
        r.getAs[Array[Byte]](3).toSeq)).toSet

  test("micro-batches land as epoch-named shards; entries match the " +
      "delivered rows; a restart from the checkpoint does not duplicate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("wds_sink_out").toString
    val ckpt = Files.createTempDirectory("wds_sink_ckpt").toString

    val in = MemoryStream[(String, Array[Byte])]
    def start() = in.toDF().toDF("key", "txt")
      .writeStream.format("wds")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    val q1 = start()
    try {
      in.addData(("a", "one".getBytes("UTF-8")),
        ("b", "two".getBytes("UTF-8")))
      q1.processAllAvailable()
      in.addData(("c", "three".getBytes("UTF-8")))
      q1.processAllAvailable()
    } finally q1.stop()

    val afterTwo = readBack(out)
    assert(afterTwo == Set(
      ("a", "txt", "one".getBytes("UTF-8").toSeq),
      ("b", "txt", "two".getBytes("UTF-8").toSeq),
      ("c", "txt", "three".getBytes("UTF-8").toSeq)))
    // epoch-keyed names: every shard carries -e<epoch>- and no task id
    val names = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).map(p => Paths.get(p).getFileName.toString)
    assert(names.nonEmpty && names.forall(_.matches(
      "shard-[0-9a-f]{8}-e\\d{6}-p\\d{5}\\.tar")), names.mkString(","))
    assert(!names.exists(_.contains("inprogress")))

    // restart from the SAME checkpoint: already-committed batches are
    // not re-emitted; new data lands in new epochs
    val q2 = start()
    try {
      in.addData(("d", "four".getBytes("UTF-8")))
      q2.processAllAvailable()
    } finally q2.stop()
    val afterRestart = readBack(out)
    assert(afterRestart == afterTwo +
      (("d", "txt", "four".getBytes("UTF-8").toSeq)),
      "restart must append exactly the new row, no duplicates")
  }

  test("an epoch replay overwrites its own shard names idempotently " +
      "(the crash-between-rename-and-offset-commit path)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("wds_replay_out").toString
    val ckpt = Files.createTempDirectory("wds_replay_ckpt").toString
    val in = MemoryStream[(String, Array[Byte])]
    val q = in.toDF().toDF("key", "txt")
      .writeStream.format("wds").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      in.addData(("a", "one".getBytes("UTF-8")))
      q.processAllAvailable()
    } finally q.stop()
    val committed = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".tar"))
    assert(committed.nonEmpty)
    // simulate the replay: the offset log says batch 0 may re-run; a
    // shard with the same epoch-keyed name must be REPLACED, not
    // refused and not duplicated — delete the commit log's last entry
    // so the restart re-executes the epoch
    val commits = Paths.get(ckpt, "commits")
    Files.list(commits).toArray.map(_.toString)
      .filter(p => {
        val n = Paths.get(p).getFileName.toString
        n == "0" || n == ".0.crc"
      }).foreach(p => Files.delete(Paths.get(p)))
    val q2 = in.toDF().toDF("key", "txt")
      .writeStream.format("wds").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(readBack(out) ==
      Set(("a", "txt", "one".getBytes("UTF-8").toSeq)),
      "replayed epoch must rewrite the same shard, not duplicate")
  }

  test("rolling composes with the streaming sink: epoch shards roll at " +
      "maxCount with sequence-suffixed names, and a restart does not " +
      "duplicate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("wds_roll_stream_out").toString
    val ckpt = Files.createTempDirectory("wds_roll_stream_ckpt").toString
    val in = MemoryStream[(String, Array[Byte])]
    def start() = in.toDF().toDF("key", "txt")
      .writeStream.format("wds")
      .option("path", out).option("checkpointLocation", ckpt)
      .option("maxCount", "2")
      .outputMode("append").start()
    val q = start()
    try {
      in.addData((0 until 7).map(i =>
        (s"k$i", s"v$i".getBytes("UTF-8"))): _*)
      q.processAllAvailable()
    } finally q.stop()
    val names = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).map(p => Paths.get(p).getFileName.toString)
    // 7 samples over the epoch's partitions at <= 2 per shard: at
    // least one partition rolled (a -sNNNNN suffix exists), none stay
    // inprogress, and the entry set is exact
    assert(names.exists(_.matches(
      "shard-[0-9a-f]{8}-e\\d{6}-p\\d{5}-s\\d{5}\\.tar")),
      s"expected rolled epoch shards: ${names.mkString(",")}")
    assert(readBack(out).map(_._1) == (0 until 7).map(i => s"k$i").toSet)
    // restart: nothing re-emits
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(readBack(out).size == 7)
  }

  test("streaming truncate/complete modes are rejected (append-only sink)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("wds_mode_out").toString
    val in = MemoryStream[(String, Array[Byte])]
    in.addData(("a", "one".getBytes("UTF-8")))
    val ex = intercept[Exception] {
      val q = in.toDF().toDF("key", "txt")
        .groupBy($"key").agg(org.apache.spark.sql.functions.max($"txt")
          .as("txt"))
        .writeStream.format("wds").option("path", out)
        .option("checkpointLocation",
          Files.createTempDirectory("wds_mode_ckpt").toString)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(ex.getMessage != null)
  }
}
