package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures what the round-13 wds read paths actually buy on a
  * non-toy lake: full-scan materialization vs a data-pruned key/ext
  * listing vs an ext-filtered read vs the sidecar COUNT(*) —
  * one synthetic image+caption lake (deterministic bytes), best of 3
  * per path, one JSON line. Usage:
  *   runMain graft.tools.WdsBench [nShards] [samplesPerShard] [imgKB]
  */
object WdsBench {
  def main(args: Array[String]): Unit = {
    val nShards = if (args.length > 0) args(0).toInt else 64
    val perShard = if (args.length > 1) args(1).toInt else 64
    val imgKb = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = "/tmp/graft_wds_bench"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    spark.range(nShards.toLong * perShard)
      .select($"id".cast("string").as("key"), $"id")
      .as[(String, Long)]
      .map { case (k, id) =>
        // deterministic pseudo-random image bytes + a short caption
        val img = new Array[Byte](imgKb * 1024)
        var x = id * 2654435761L + 1
        var i = 0
        while (i < img.length) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          img(i) = x.toByte
          i += 1
        }
        (k, img, s"caption for $id".getBytes("UTF-8"))
      }
      .toDF("key", "img", "txt")
      .repartition(nShards)
      .write.format("wds").mode("overwrite").save(dir)
    val lakeBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(dir)).getLength

    def best3(f: => Long): (Double, Long) = {
      var bestT = Double.MaxValue
      var v = 0L
      for (_ <- 0 until 3) {
        val t0 = System.nanoTime()
        v = f
        bestT = math.min(bestT, (System.nanoTime() - t0) / 1e9)
      }
      (bestT, v)
    }

    val df = spark.read.format("wds").load(dir)
    // full materialization: every payload byte allocated + summed
    val (tFull, full) = best3(
      df.selectExpr("sum(length(data))").collect()(0).getLong(0))
    // data-pruned listing: headers only, payloads seek-skipped
    val (tList, nList) = best3(
      df.select("key", "ext").groupBy("ext").count()
        .collect().map(_.getLong(1)).sum)
    // pushed ext filter: captions materialize, image payloads skipped
    val (tCap, capBytes) = best3(
      df.filter($"ext" === "txt").selectExpr("sum(length(data))")
        .collect()(0).getLong(0))
    // sidecar count: no shard opened
    val (tCnt, cnt) = best3(df.groupBy().count().collect()(0).getLong(0))

    println(s"""{"metric":"wds_read_paths","unit":"sec","lake_mb":${
      lakeBytes / 1048576},"shards":$nShards,"entries":$cnt,
      |"full_scan_s":$tFull,"listing_s":$tList,"caption_scan_s":$tCap,
      |"count_meta_s":$tCnt,"payload_bytes":$full,
      |"caption_bytes":$capBytes,"n_listed":$nList}"""
      .stripMargin.replace("\n", ""))
    spark.stop()
  }
}
