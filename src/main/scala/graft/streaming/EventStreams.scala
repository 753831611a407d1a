package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming extension (SURVEY.md §2B "streaming": the
  * reference is strictly batch over closed files; this is the natural
  * Spark-native extension — `readStream` + watermark + windowed
  * aggregation, with the identical transformation usable in batch mode).
  *
  * The transformation is defined once over an untyped DataFrame so the
  * SAME code runs in a `readStream` (incremental, stateful, late-data
  * tolerant via watermark) and in plain batch (used by the `q24` oracle
  * check) — the recommended Structured Streaming design.
  */
object EventStreams {

  /** Tumbling 1-hour counts + exact decimal sums per event type.
    * Output keys the window by epoch seconds so results are
    * engine-portable (no timestamp-type drift). */
  def hourlyAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        unix_timestamp($"window.start").as("window_start_s"),
        $"event_type", $"n", $"sum_value")
  }

  /** Same aggregation as a late-data-tolerant stream. */
  def hourlyAggStream(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        unix_timestamp($"window.start").as("window_start_s"),
        $"event_type", $"n", $"sum_value")
  }

  /** Stateful sessionization with flatMapGroupsWithState: emits one row
    * per closed session (30-minute inactivity gap). */
  final case class SessionOut(user_id: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** per-user in-flight session state */
  final case class St(nEvents: Long, startUs: Long, lastUs: Long)

  /** View->purchase attribution as a stream-stream INTERVAL JOIN: a
    * purchase joins every view by the same user in the preceding hour.
    * Defined once over DataFrames; the streaming wrapper adds watermarks
    * on both sides so Spark bounds the join state (views older than
    * watermark+1h are evicted) and emits append-mode results.
    *
    * Scale: the join shuffles both streams by user_id only; state per
    * key is bounded by the time condition, so throughput is governed by
    * events-per-user-per-hour, not history length. */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    import views.sparkSession.implicits._
    val v = views.select($"user_id", $"ts".as("view_ts"),
      $"event_id".as("view_id"))
    val p = purchases.select($"user_id".as("p_user"), $"ts".as("buy_ts"),
      $"event_id".as("buy_id"), $"value".as("buy_value"))
    v.join(p, $"user_id" === $"p_user" &&
        $"buy_ts" > $"view_ts" &&
        $"buy_ts" <= $"view_ts" + expr("interval 1 hour"))
      .select($"user_id", $"view_id", $"buy_id",
        unix_micros($"view_ts").as("view_us"),
        unix_micros($"buy_ts").as("buy_us"),
        $"buy_value")
  }

  /** Same join against live streams (watermarks bound the state). */
  def viewPurchaseJoinStream(views: DataFrame, purchases: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    viewPurchaseJoin(
      views.withWatermark("ts", watermark),
      purchases.withWatermark("ts", watermark))

  /** Streaming exact dedup — the streaming form of the pipeline's
    * `dedup_exact` operator: drop re-deliveries of the same event id,
    * keeping state only within the watermark so it cannot grow without
    * bound (the difference between `dropDuplicates`, which remembers
    * every key forever, and the production-safe variant). */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    // keep the watermarked ts column itself — projecting it into a long
    // would detach the watermark from the stateful operator
    val typed = events
      .withWatermark("ts", s"$gapMinutes minutes")
      .select($"user_id".as[Long], $"ts".as[java.sql.Timestamp])
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[St, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[St]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.nEvents, st.startUs, st.lastUs))
          } else {
            val times = rows.map(r => r._2.getTime * 1000L +
              (r._2.getNanos / 1000) % 1000).toSeq.sorted
            var out = List.empty[SessionOut]
            var st = state.getOption.getOrElse(St(0, times.head, times.head))
            times.foreach { t =>
              if (st.nEvents > 0 && t - st.lastUs > gapUs) {
                out ::= SessionOut(user, st.nEvents, st.startUs, st.lastUs)
                st = St(1, t, t)
              } else {
                st = St(st.nEvents + 1,
                  if (st.nEvents == 0) t else st.startUs, t)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastUs / 1000 + gapMinutes * 60000L)
            out.reverseIterator
          }
      }.toDF()
  }
}

/** Batch-mode twins of the streaming transforms, registered as oracle-
  * checked queries (identical code path as the stream). */
object StreamingQueries {
  import graft.{Q, Tables}

  val defs: Seq[Q] = Seq(
    // sliding window: 2-hour windows sliding by 1 hour — every event lands
    // in exactly two windows; the oracle expands the window membership
    // with a lateral offset unnest
    Q("q33_sliding_window",
      (s, d) => {
        import org.apache.spark.sql.functions._
        val events = Tables.events(s, d)
        import events.sparkSession.implicits._
        events
          .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .select(unix_timestamp($"window.start").as("window_start_s"),
            $"event_type", $"n")
      },
      Some("""SELECT ((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) - o.o)
            * 3600 AS window_start_s,
          event_type, COUNT(*) AS n
        FROM events, LATERAL (SELECT UNNEST([0, 1]) AS o) o
        GROUP BY 1, 2""")),

    // stream-stream interval join, batch twin (the streaming form is
    // driven end-to-end in EventStreamsSpec). Oracle compares at micro
    // precision on both sides: Spark timestamps are micros, so the
    // DuckDB TIMESTAMP_NS input is truncated before the interval test.
    Q("q34_stream_interval_join_twin",
      (s, d) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.events(s, d)
        EventStreams.viewPurchaseJoin(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"))
      },
      Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS buy_id,
          epoch_us(CAST(v.ts AS TIMESTAMP)) AS view_us,
          epoch_us(CAST(p.ts AS TIMESTAMP)) AS buy_us,
          p.value AS buy_value
        FROM events v JOIN events p
          ON v.user_id = p.user_id
         AND CAST(p.ts AS TIMESTAMP) > CAST(v.ts AS TIMESTAMP)
         AND CAST(p.ts AS TIMESTAMP) <=
             CAST(v.ts AS TIMESTAMP) + INTERVAL 1 HOUR
        WHERE v.event_type = 'view' AND p.event_type = 'purchase'""")),

    Q("q24_stream_hourly_batch_twin",
      (s, d) => EventStreams.hourlyAgg(Tables.events(s, d)),
      Some("""SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600
          AS window_start_s,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2""")),

    // ----- streaming ingestion-dedup screen: batch twin -------------------
    // The anchor for CorpusScreenStream (stream-static join against
    // the persisted exact-digest index — object doc): the twin runs
    // the SAME screenAgainstIndex plan tail over the same
    // deterministic delivery, and CorpusScreenStreamSpec matches the
    // streamed rows against this row set across micro-batch
    // boundaries and a checkpoint restart. The oracle re-derives the
    // base summary and the delivery from raw text.
    Q("dedup_screen_stream_twin",
      (s, d) => CorpusScreenStream.screenTwin(s, d),
      Some("""WITH bidx AS (
          SELECT md5(text) AS h, MIN(doc_id) AS dmin, COUNT(*) AS dcnt
          FROM documents WHERE doc_id % 7 <> 0 GROUP BY 1),
        probe AS (
          SELECT doc_id + 2000000 AS doc_id, text FROM documents
          WHERE doc_id % 5 = 0)
        SELECT p.doc_id, bidx.dmin AS match_doc,
          CAST(COALESCE(bidx.dcnt, 0) AS BIGINT) AS n_copies
        FROM probe p LEFT JOIN bidx ON md5(p.text) = bidx.h""")),

    // ----- streaming FUZZY (near-dup) screen: batch twin ------------------
    // The anchor for CorpusScreenStream.lshScreened — per-row MinHash
    // bands (Dedup.rowBands, a stateless projection) inner-joined
    // against the persisted LSH bucket summary; one row per hit band.
    // The oracle re-derives the whole chain (shingles → signatures →
    // bands → base-split bucket minima → re-keyed delivery probe)
    // from raw text, so a hash match proves the per-row band
    // formulation AND the artifact equal full recomputation.
    Q("dedup_lsh_screen_stream_twin",
      (s, d) => CorpusScreenStream.lshScreenTwin(s, d),
      Some(graft.operators.Dedup.lshScreenTwinSql)))
}
