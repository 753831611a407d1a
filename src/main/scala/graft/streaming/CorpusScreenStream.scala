package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingestion-dedup screen — the continuous form of the batch
  * `dedup_exact_incremental` query, and the engine's stream-STATIC
  * join surface: deliveries of new documents LAND as parquet files in
  * a directory and are screened against the PERSISTED exact-digest
  * index ([[graft.operators.Dedup.digestIndex]], the DeltaChain
  * artifact) as they arrive, instead of waiting for the next batch
  * sweep — the shape a continuously-crawling corpus pipeline actually
  * runs ("is this just-fetched page already in the corpus?").
  *
  * Composition: `readStream` over the landing dir → one digest
  * projection per row → a stream-static LEFT join against the index
  * relation → (doc_id, match_doc, n_copies) append-mode rows — the
  * batch screen's exact output schema, produced by the SAME
  * `screenAgainstIndex` plan tail, so the stream and its twin cannot
  * drift. Stream-static joins are STATELESS in Structured Streaming
  * (each micro-batch joins against the static plan — no watermark, no
  * state store), so exactly-once across checkpoint restarts rides
  * entirely on the file source's admission log; there is no operator
  * state to corrupt.
  *
  * Scale shape: the static side is the ≤-1-row-per-key digest summary
  * (never the base corpus text), the stream side is one narrow
  * projection per delivered row, and the join is the per-batch
  * equi-join Spark plans for it (broadcast when the summary is small,
  * shuffled otherwise). At 100 TB of INDEX the summary is still ~32
  * bytes per distinct document — the screen's cost scales with the
  * delivery, not the corpus.
  */
object CorpusScreenStream {

  /** The shared screen tail — batch twin and stream both run EXACTLY
    * this: digest each doc, left-probe the index, 0-fill clean rows. */
  private def screenAgainstIndex(docs: DataFrame, idx: DataFrame)
      : DataFrame =
    docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .join(idx, Seq("h"), "left")
      .select(col("doc_id"), col("dmin").as("match_doc"),
        coalesce(col("dcnt"), lit(0L)).as("n_copies"))

  /** The deterministic delivery the battery twin and the spec share:
    * re-keyed copies of every doc_id % 5 == 0 doc (above 2·10^6) —
    * re-fetched content. The ones whose original sits on the indexed
    * base split (% 7 != 0) must HIT it; the % 35 == 0 ones (original
    * lives on the probe split, never indexed) must screen CLEAN. */
  def delivery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, d)
      .filter($"doc_id" % 5 === 0)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
  }

  /** Batch twin of [[screened]] over [[delivery]] — the DuckDB-oracled
    * anchor (`dedup_screen_stream_twin`) the streaming spec matches
    * row-for-row. */
  def screenTwin(s: SparkSession, d: String): DataFrame =
    screenAgainstIndex(delivery(s, d),
      graft.operators.Dedup.digestIndex(s, d))

  /** The streaming screen over a parquet landing dir: one screened row
    * per delivered doc, append mode. */
  def screened(s: SparkSession, d: String, landingDir: String)
      : DataFrame =
    screenAgainstIndex(
      s.readStream.schema("doc_id LONG, text STRING").parquet(landingDir),
      graft.operators.Dedup.digestIndex(s, d))
}
