package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Drives the streaming pipeline end-to-end with a real file-source
  * readStream over the events table (one parquet file per micro-batch). */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import spark.implicits._

    // file stream source needs a directory; stage the events file into one
    val dir = java.nio.file.Files.createTempDirectory("stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val q = EventStreams.hourlyAggStream(stream, watermark = "2 hours")
      .writeStream.format("memory").queryName("demo_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("demo_out")
    println(s"closed windows emitted: ${out.count()}")
    out.orderBy("window_start_s", "event_type").show(8)
    spark.stop()
  }
}
