package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Round-17 optimization helper: spread a CPU-amplifying relation
  * across the cluster before its expensive per-row stage.
  *
  * Motivation (guide §2.5 "input skew" / §1 measurement): the corpus
  * tables at bench scale are single small parquet files, so a scan
  * feeding a 100-1000x CPU amplifier (per-position md5 grams, shingle
  * hashing, media decode) plans as ONE input partition and the whole
  * amplifier serializes on one core (measured: text_repeat_spans spent
  * ~2.8 s of its 4.2 s in a single-task gram stage; the MJPEG decode of
  * mm_video_overlap_mjpeg ran entirely on one task).
  *
  * The fix is operator-level and scale-adaptive, not a config hack:
  * when (and only when) the upstream scan yields fewer partitions than
  * defaultParallelism, hash-repartition on the row key. The exchange
  * moves the raw input bytes once — negligible next to the amplified
  * downstream work — and at production scale the scan already has more
  * partitions than cores, so this is a no-op there.
  */
object Spread {

  /** `df` hash-repartitioned on `key` to defaultParallelism iff its
    * current plan has fewer partitions than that; identity otherwise. */
  def byKey(df: DataFrame, key: String): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= par) df
    else df.repartition(par, col(key))
  }
}
