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

  // ----- the FUZZY streaming screen (near-dup, LSH bucket index) ----------
  // The exact screen above catches byte-identical re-ingestion; the
  // fuzzy screen catches near-dups of indexed content — the second
  // gate of a continuous ingestion pipeline. Stream side: each
  // delivered doc's MinHash band keys computed PER ROW
  // (Dedup.rowBands — array_min over the doc's own shingle array, a
  // pure projection: no explode, no groupBy, NO state), then a
  // stream-static INNER join against the persisted (band,x,y) bucket
  // summary (dedup_lsh_incremental's artifact; ≤ 1 row per key).
  // Output is one row per HIT band — per-(doc,band) granularity keeps
  // the stream stateless (a per-doc rollup would need a streaming
  // aggregation; downstream consumers fold hits as they please).

  /** The shared fuzzy-screen tail over any (doc_id, text) relation. */
  private def lshScreenAgainstIndex(docs: DataFrame, idx: DataFrame)
      : DataFrame =
    graft.operators.Dedup.rowBands(docs)
      .join(idx.select(col("band"), col("x"), col("y"), col("bmin")),
        Seq("band", "x", "y"))
      .select(col("doc_id"), col("band"), col("bmin"))

  /** Batch twin of [[lshScreened]] over [[delivery]] — the
    * DuckDB-oracled anchor (`dedup_lsh_screen_stream_twin`). */
  def lshScreenTwin(s: SparkSession, d: String): DataFrame =
    lshScreenAgainstIndex(delivery(s, d),
      graft.operators.Dedup.lshBucketIndex(s, d))

  /** The streaming fuzzy screen over a parquet landing dir: one row
    * per (delivered doc, hit band), append mode, stateless. */
  def lshScreened(s: SparkSession, d: String, landingDir: String)
      : DataFrame =
    lshScreenAgainstIndex(
      s.readStream.schema("doc_id LONG, text STRING").parquet(landingDir),
      graft.operators.Dedup.lshBucketIndex(s, d))

  // ----- the IMAGE streaming screen (dHash byte-pair band index) ----------
  // Round 12 closes the loop the incremental image index opened: image
  // deliveries land as (doc_id, img_id) parquet and are screened
  // against the persisted dHash band index as they arrive — per-row
  // decode + hash + band (pure projection), stream-static inner join
  // against the ≤-1-row-per-key summary, one output row per hit band.
  // Stateless, so exactly-once rides on the file source's admission
  // log alone. The shared tail + delivery live in
  // [[graft.operators.MediaDedup]] next to the index they probe.

  /** Batch twin of [[dhashScreened]] — the DuckDB-oracled anchor
    * (`mm_dhash_screen_stream_twin`). */
  def dhashScreenTwin(s: SparkSession, d: String): DataFrame =
    graft.operators.MediaDedup.dhashScreenAgainstIndex(
      graft.operators.MediaDedup.dhashDelivery(s, d),
      graft.operators.MediaDedup.mmDhashIndex(s, d))

  /** The streaming image screen over a parquet landing dir: one row per
    * (delivered doc, hit band-pair), append mode, stateless. */
  def dhashScreened(s: SparkSession, d: String, landingDir: String)
      : DataFrame =
    graft.operators.MediaDedup.dhashScreenAgainstIndex(
      s.readStream.schema("doc_id LONG, img_id LONG").parquet(landingDir),
      graft.operators.MediaDedup.mmDhashIndex(s, d))
}
