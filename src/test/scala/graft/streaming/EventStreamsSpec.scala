package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventStreamsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("hourly windowed aggregation over a real stream matches batch twin") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val query = EventStreams.hourlyAggStream(events, watermark = "30 minutes")
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()

    // batch 1: two events in hour 0, one in hour 1
    input.addData((ts(5), "click", 1.5), (ts(50), "click", 2.5),
      (ts(70), "view", 4.0))
    query.processAllAvailable()
    // nothing final yet (watermark hasn't passed hour 0)
    // batch 2: late-ish event inside watermark + an event far ahead that
    // closes both earlier windows
    input.addData((ts(55), "click", 1.0), (ts(200), "view", 9.0))
    query.processAllAvailable()
    val out = spark.table("hourly_out")
      .orderBy("window_start_s", "event_type").collect()
    query.stop()

    // hour 0 (start 1704067200): 3 clicks summing 5.0; hour 1: 1 view 4.0
    val hour0 = 1704067200L
    assert(out.exists(r => r.getLong(0) == hour0 &&
      r.getString(1) == "click" && r.getLong(2) == 3 && r.getDouble(3) == 5.0))
    assert(out.exists(r => r.getLong(0) == hour0 + 3600 &&
      r.getString(1) == "view" && r.getLong(2) == 1 && r.getDouble(3) == 4.0))
  }

  test("streaming DNS-tunnel signals: minted subdomains surface, dups collapse") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val queries = input.toDF().toDF("time", "dns_qname")

    val q = DnsTunnelStream
      .uniqueNamesPerSld(queries, watermark = "10 minutes", window = "5 minutes")
      .writeStream.format("memory").queryName("tunnel_out")
      .outputMode("append").start()
    try {
      // window [0,5): a tunnel SLD mints 30 unique subdomains (each sent
      // twice — retries must not double-count); a benign SLD resolves the
      // same two names over and over
      val tunnel = (0 until 30).flatMap { i =>
        val name = f"chunk$i%03d.exfil.example."
        Seq((ts(1), name), (ts(2), name))
      }
      val benign = (0 until 30).map { i =>
        (ts(1 + i % 4), if (i % 2 == 0) "www.normal.example."
          else "mail.normal.example.")
      }
      // DNS is case-insensitive (0x20 mixing): uppercase retries of
      // already-seen chunks must collapse, not mint new "unique" names;
      // bare/root names must be dropped, not pooled under sld=""
      val noise = Seq((ts(2), "CHUNK000.EXFIL.example."),
        (ts(2), "ChUnK001.exfil.EXAMPLE."), (ts(1), "localhost."),
        (ts(1), "."))
      input.addData(tunnel ++ benign ++ noise: _*)
      q.processAllAvailable()
      // advance far beyond watermark + window to finalize [0,5)
      input.addData((ts(60), "late.other.example."))
      q.processAllAvailable()
      val out = spark.table("tunnel_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      val w0 = out.filter(_._1 == 1704067200L).map(t => t._2 -> t._3).toMap
      assert(w0("exfil.example.") == 30, s"got $out")   // dups collapsed
      assert(w0("normal.example.") == 2)
      assert(w0("exfil.example.") > 10 * w0("normal.example."))
      assert(!w0.contains(""), s"bare names must be dropped, got $out")
    } finally q.stop()
  }

  test("quality gate runs unchanged as a streaming stage") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")

    val query = graft.operators.TextAnalysis.qualityGate(docs)
      .writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    val sample = Seq(
      1L -> "short doc",                                        // too_short
      2L -> Seq.fill(30)("spark makes rows go fast and far").mkString(" "),
      3L -> (("unique word stream alpha beta gamma delta epsilon zeta eta " * 3) +
        "theta iota kappa lambda mu nu xi omicron pi rho sigma tau"))
    input.addData(sample: _*)
    query.processAllAvailable()
    val streamed = spark.table("gate_out")
      .select("doc_id", "keep", "reason").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).sortBy(_._1)
    query.stop()

    // identical transform over the same rows in batch
    val batch = graft.operators.TextAnalysis.qualityGate(
      sample.toDF("doc_id", "text"))
      .select("doc_id", "keep", "reason").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).sortBy(_._1)
    assert(streamed.sameElements(batch))
    assert(streamed.head == ((1L, false, "too_short")))
    assert(streamed.exists(_._2)) // at least one doc passes
  }

  test("late data beyond the watermark is dropped") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val query = EventStreams.hourlyAggStream(events, watermark = "10 minutes")
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()

    input.addData((ts(5), "click", 1.0))
    query.processAllAvailable()
    input.addData((ts(500), "view", 1.0)) // advances watermark far past hour 0
    query.processAllAvailable()
    input.addData((ts(6), "click", 99.0)) // too late — must be dropped
    input.addData((ts(600), "view", 1.0)) // closes more windows
    query.processAllAvailable()
    val out = spark.table("late_out").collect()
    query.stop()

    val hour0 = out.filter(r => r.getLong(0) == 1704067200L &&
      r.getString(1) == "click")
    assert(hour0.length == 1)
    assert(hour0.head.getLong(2) == 1 && hour0.head.getDouble(3) == 1.0)
  }

  test("stateful sessionization emits closed sessions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val query = EventStreams.sessionizeStream(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    // user 1: events at minute 0, 10 (one session), then 100 (new session)
    input.addData((ts(0), 1L, 0.0), (ts(10), 1L, 0.0))
    query.processAllAvailable()
    input.addData((ts(100), 1L, 0.0))
    query.processAllAvailable()
    input.addData((ts(600), 2L, 0.0)) // push watermark way ahead
    query.processAllAvailable()
    input.addData((ts(1200), 2L, 0.0)) // another advance to fire timeouts
    query.processAllAvailable()
    val out = spark.table("sess_out").orderBy("start_us").collect()
    query.stop()

    // first session of user 1 closed: 2 events, 0..10min
    assert(out.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("foreachBatch lands micro-batches as partitioned parquet " +
       "(production sink pattern)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("stream_lake").toString
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.hourlyAggStream(
        input.toDF().toDF("ts", "event_type", "value"),
        watermark = "30 minutes")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").partitionBy("event_type").parquet(out)
      }
      .outputMode("append").start()
    try {
      input.addData((ts(5), "click", 1.0), (ts(65), "view", 2.0))
      q.processAllAvailable()
      input.addData((ts(300), "view", 9.0)) // advance watermark, close hour 0
      q.processAllAvailable()
      input.addData((ts(900), "view", 1.0)) // close remaining windows
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(out)
    assert(landed.count() >= 2, "closed windows must land in the lake")
    // partitioned layout: event_type is a partition column readable back
    assert(landed.select($"event_type").distinct().count() >= 2)
  }

  test("built-in session_window closes gap-merged sessions under watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    // the exact groupBy q42_session_window runs in batch, under readStream
    val query = events
      .withWatermark("ts", "10 minutes")
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .selectExpr("user_id", "unix_micros(session_window.start) AS start_us",
        "n_events")
      .writeStream.format("memory").queryName("swin_out")
      .outputMode("append").start()

    // user 1: minutes 0 and 10 merge (gap < 30); minute 100 starts fresh
    input.addData((ts(0), 1L), (ts(10), 1L), (ts(100), 1L))
    query.processAllAvailable()
    input.addData((ts(600), 2L)) // advance watermark far past both sessions
    query.processAllAvailable()
    input.addData((ts(1200), 2L)) // once more so every close is emitted
    query.processAllAvailable()
    val out = spark.table("swin_out").collect()
    query.stop()

    val base = 1704067200L * 1000000L // 2024-01-01 00:00:00 UTC in micros
    assert(out.exists(r => r.getLong(0) == 1L &&
      r.getLong(1) == base && r.getLong(2) == 2L),
      s"merged session missing in ${out.mkString(";")}")
    assert(out.exists(r => r.getLong(0) == 1L &&
      r.getLong(1) == base + 100L * 60 * 1000000 && r.getLong(2) == 1L),
      s"second session missing in ${out.mkString(";")}")
  }

  test("stream-stream interval join emits in-window pairs only") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long, Long, Double)]
    val buys = MemoryStream[(Timestamp, Long, Long, Double)]
    val cols = Seq("ts", "user_id", "event_id", "value")
    val query = EventStreams.viewPurchaseJoinStream(
        views.toDF().toDF(cols: _*), buys.toDF().toDF(cols: _*),
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("vp_out")
      .outputMode("append").start()

    // user 1 views at minute 0; buys at minute 30 (in window) and
    // minute 90 (outside the 1-hour window); user 2 buys with no view
    views.addData((ts(0), 1L, 100L, 0.0))
    buys.addData((ts(30), 1L, 200L, 9.99), (ts(90), 1L, 201L, 5.0),
      (ts(40), 2L, 300L, 1.0))
    query.processAllAvailable()
    val out = spark.table("vp_out").collect()
    query.stop()

    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("user_id") == 1L &&
      r.getAs[Long]("view_id") == 100L &&
      r.getAs[Long]("buy_id") == 200L &&
      r.getAs[Double]("buy_value") == 9.99)
  }

  test("streaming dedup drops re-delivered event ids within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val events = input.toDF().toDF("ts", "event_id", "event_type")
    val query = EventStreams.dedupStream(events, watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    input.addData((ts(0), 1L, "click"), (ts(1), 2L, "view"))
    query.processAllAvailable()
    // re-delivery of id 1 inside the watermark window + one new id
    input.addData((ts(2), 1L, "click"), (ts(3), 3L, "view"))
    query.processAllAvailable()
    val out = spark.table("dedup_out").collect()
    query.stop()

    assert(out.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("batch twin equals direct batch aggregation") {
    import spark.implicits._
    val df = Seq(
      (ts(5), "a", 1.0), (ts(20), "a", 2.0), (ts(70), "b", 3.0))
      .toDF("ts", "event_type", "value")
    val got = EventStreams.hourlyAgg(df)
      .orderBy("window_start_s", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1704067200L, "a", 2L, 3.0),
      (1704070800L, "b", 1L, 3.0)))
  }
}
