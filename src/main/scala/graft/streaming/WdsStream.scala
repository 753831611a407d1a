package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuous WebDataset ingestion: tar shards LAND in a directory and
  * samples stream out as (shard, key, ext, data) entry rows — the
  * multimodal companion to the parquet-landing screens.
  *
  * Deliberately NOT a custom MicroBatchStream: shards are immutable
  * whole files (the `wds` sink's atomic renames guarantee a landed
  * shard is complete), so Spark's built-in binaryFile file source
  * already provides the admission log, backpressure, and exactly-once
  * across checkpoint restarts — the codec is a stateless per-file
  * flatMap through the same checksum-verifying [[graft.operators
  * .Multimodal.TarCodec]] the batch `wds` scan uses. Compose the
  * built-in source; don't re-implement it.
  *
  * Scale shape: one task per landed shard per micro-batch, constant
  * state (none beyond the file-source log), downstream screens join
  * stream-static exactly like the image/text delivery screens.
  */
object WdsStream {

  def entries(s: SparkSession, landingDir: String): DataFrame = {
    import s.implicits._
    // the binaryFile format's fixed schema (file streams require it
    // declared up front)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("path", org.apache.spark.sql.types.StringType)
      .add("modificationTime", org.apache.spark.sql.types.TimestampType)
      .add("length", org.apache.spark.sql.types.LongType)
      .add("content", org.apache.spark.sql.types.BinaryType)
    s.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .schema(schema)
      .load(landingDir)
      .select($"path", $"content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        graft.operators.Multimodal.TarCodec.decode(bytes).map {
          case (name, data) =>
            // first-dot split, shared with the batch wds scan
            val (key, ext) = graft.sources.wds.WdsTable.splitKeyExt(name)
            (shard, key, ext, data)
        }
      }
      .toDF("shard", "key", "ext", "data")
  }
}
