package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the 100 TB techniques: bucketed co-located
  * joins (no shuffle), broadcast joins, pushdown, and the typed packet
  * Dataset. These tests read `.queryExecution.executedPlan`, the same
  * evidence `.explain` shows. */
class ScaleTechniquesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Tables.orders(spark, sf).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables.lineitem(spark, sf).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      // disable auto-broadcast so the join must be sort-merge — the point
      // is that bucketing removes the per-join shuffle entirely
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val n = joined.count()
        assert(n == 5)
        val shuffles = joined.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        // exactly one exchange (for the final groupBy) — none for the join
        assert(shuffles.length == 1, joined.queryExecution.executedPlan)
        assert(joined.queryExecution.executedPlan.toString
          .contains("SortMergeJoin"))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val df = SparkEntry.queries("q03_revenue_by_nation")(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("parquet scans receive pushed filters and pruned columns") {
    import spark.implicits._
    val df = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" <= lit("1996-01-01").cast("timestamp"))
      .select($"l_orderkey")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_shipdate"))
  }

  test("hive-style partitioned layout prunes partitions at plan time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("part_docs").toString
    Tables.documents(spark, sf).write.partitionBy("source")
      .mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter($"source" === "src3")
      .select($"doc_id")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val s = scan.toString
    // the source=src3 predicate must become a partition filter (pruned at
    // planning), not a data filter over all files
    assert(s.contains("PartitionFilters") && s.contains("src3"), s.take(800))
    // execute THIS queryExecution so its scan metrics populate
    val rows = df.collect()
    val scanned = scan.metrics.get("numFiles")
    scanned.foreach(m => assert(m.value >= 1 &&
      m.value < 20, s"read ${m.value} files — pruning didn't engage"))
    assert(rows.length == Tables.documents(spark, sf)
      .filter($"source" === "src3").count())
  }

  test("pcap -> parquet ETL: decoded captures persist as a pruned, " +
       "partitioned lake table") {
    import spark.implicits._
    // the landing-to-lakehouse pattern for 100 TB of captures: decode
    // once, persist columnar partitioned by resolver, query the parquet
    // with partition pruning + pushdown instead of re-decoding pcap
    val dir = java.nio.file.Files.createTempDirectory("pcap_lake").toString
    val qr = java.nio.file.Paths.get("/tmp/graft_synth_qr_small.pcap")
    if (!java.nio.file.Files.exists(qr))
      java.nio.file.Files.write(qr,
        graft.pcap.PcapSynth.file(graft.pcap.PcapSynth.qrConversations(500)))
    spark.read.format("pcap").option("decoder", "dns").load(qr.toString)
      .filter($"dns_qname".isNotNull)
      .select($"ts_micro", $"src", $"dst", $"dns_qr", $"dns_qname",
        $"dns_rcode")
      .write.partitionBy("dst").mode("overwrite").parquet(dir)
    val lake = spark.read.parquet(dir)
      .filter($"dst" === "3.0.0.1" && !$"dns_qr")
      .select($"dns_qname")
    val scan = lake.queryExecution.executedPlan.collectLeaves().head
    val s = scan.toString
    assert(s.contains("PartitionFilters") && s.contains("3.0.0.1"),
      s.take(800))
    assert(s.contains("PushedFilters") && s.contains("dns_qr"), s.take(800))
    val rows = lake.collect()
    // queries to resolver 3 (i % 13 == 2) out of 500 conversations
    assert(rows.length == (0 until 500).count(_ % 13 == 2))
  }

  test("IVF inverted lists persist partitioned by list id; probes prune " +
       "partitions") {
    import spark.implicits._
    // the SCALE.md claim, demonstrated: persist (vector, list) partitioned
    // by the list id; a query probing nprobe lists reads ONLY those
    // partitions — at 100 TB the unprobed inverted lists are never opened
    val dir = java.nio.file.Files.createTempDirectory("ivf_lists").toString
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) v")
    val cents = e.filter($"vec_id" < 8)
      .selectExpr("vec_id AS cid", "v AS c")
    val lists = e.crossJoin(broadcast(cents))
      .selectExpr("vec_id", "v", "cid",
        """aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)),
           CAST(0.0 AS DOUBLE), (a, z) -> a + z) AS dist""")
      .groupBy($"vec_id")
      .agg(min(struct($"dist", $"cid")).as("m"), first($"v").as("v"))
      .selectExpr("vec_id", "v", "m.cid AS list_id")
    lists.write.partitionBy("list_id").mode("overwrite").parquet(dir)
    val probed = spark.read.parquet(dir)
      .filter($"list_id".isin(2, 5))
    val scan = probed.queryExecution.executedPlan.collectLeaves().head
    val s = scan.toString
    assert(s.contains("PartitionFilters") && s.contains("list_id"),
      s.take(800))
    val rows = probed.collect()
    assert(rows.nonEmpty && rows.length < e.count())
    probed.collect() // populate metrics on THIS execution
    scan.metrics.get("numFiles").foreach(m =>
      assert(m.value <= 4, s"probe read ${m.value} files — no pruning"))
  }

  test("IsNotNull pushdown skips materialization without changing results") {
    import spark.implicits._
    def scan(push: Boolean) = spark.read.format("pcap")
      .option("decoder", "dns").option("pushdown", push.toString)
      .load("/tmp/graft_synth_32m.pcap")
      .filter($"dns_qname".isNotNull)
      .groupBy($"dns_qtype_str").count()
    graft.pcap.PcapSynth.ensureFile(
      java.nio.file.Paths.get("/tmp/graft_synth_32m.pcap"), 32L << 20)
    val pushed = scan(true).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = scan(false).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pushed == plain && pushed.nonEmpty)
  }

  test("dns string predicates push into the pcap decoder") {
    import spark.implicits._
    val qr = java.nio.file.Paths.get("/tmp/graft_synth_qr_small.pcap")
    if (!java.nio.file.Files.exists(qr))
      java.nio.file.Files.write(qr,
        graft.pcap.PcapSynth.file(graft.pcap.PcapSynth.qrConversations(500)))
    val df = spark.read.format("pcap").option("decoder", "dns")
      .load(qr.toString)
      .filter($"dns_qname".endsWith(".example7.com.") && !$"dns_qr")
      .select($"dns_qname", $"src")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("StringEndsWith(dns_qname"), scan.take(600))
    // pushdown must be a pure row-skip: same rows as the unpushed plan
    val unpushed = spark.read.format("pcap").option("decoder", "dns")
      .load(qr.toString).select($"dns_qname", $"src", $"dns_qr")
      .collect()
      .filter(r => !r.isNullAt(0) && r.getString(0).endsWith(".example7.com.")
        && !r.getBoolean(2))
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val pushed = df.collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(pushed == unpushed && pushed.nonEmpty)
  }

  test("tcp_flags predicates push into the pcap decoder") {
    import spark.implicits._
    val hs = java.nio.file.Paths.get("/tmp/graft_synth_handshake.pcap")
    graft.pcap.PcapSynth.ensureHandshakeFile(hs, 50)
    val df = spark.read.format("pcap").load(hs.toString)
      .filter($"tcp_flags" === "SYN")
      .select($"src", $"dst_port")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("EqualTo(tcp_flags,SYN)"), scan.take(600))
    // pushdown must be a pure row-skip: same rows as the unpushed plan
    val unpushed = spark.read.format("pcap").load(hs.toString)
      .select($"src", $"dst_port", $"tcp_flags").collect()
      .filter(r => !r.isNullAt(2) && r.getString(2) == "SYN")
      .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    val pushed = df.collect()
      .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(pushed == unpushed && pushed.size == 85) // 50 clients + 35 scans
  }

  test("every DNS projection is columnar, RR-section arrays included") {
    import spark.implicits._
    val p = java.nio.file.Paths.get("/tmp/graft_colspec.pcap")
    graft.pcap.PcapSynth.ensureQrFile(p, 50)   // real DNS query/response mix
    def isColumnar(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("ColumnarToRow")
    // the DNS-telemetry projection (qname/qtype aggregation shape) must
    // ride the vectorized batch path...
    val scalar = spark.read.format("pcap").option("decoder", "dns")
      .load(p.toString).select($"dns_qname", $"dns_qtype_str", $"dns_qr")
    assert(isColumnar(scalar), "scalar DNS projection lost the columnar path")
    // ...and since round 7 the RR-section ARRAY columns append through
    // the vector's child arrays instead of falling back to the row path
    val arrays = spark.read.format("pcap").option("decoder", "dns")
      .load(p.toString).select($"dns_qname", $"dns_answer")
    assert(isColumnar(arrays), "array projection lost the columnar path")
    // golden parity: both paths produce identical rows, arrays included
    // (multi-element answer/authority/additional sections, NULLs on the
    // query side, empty sections on NXDOMAIN responses)
    def rows(columnar: Boolean) = spark.read.format("pcap")
      .option("decoder", "dns").option("columnar", columnar.toString)
      .load(p.toString)
      .select($"dns_qname", $"dns_qtype_str", $"src", $"ts_micro",
        $"dns_answer", $"dns_authority", $"dns_additional")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(rows(columnar = true).toSeq == rows(columnar = false).toSeq)
  }

  test("TcpFlag membership predicates catch ECN-negotiating handshakes") {
    import spark.implicits._
    // real stacks negotiate ECN: SYN renders "SYN|ECE|CWR", SYN|ACK
    // renders "SYN|ACK|ECE" — exact-equality matching misses both
    val df = Seq("SYN", "SYN|ECE|CWR", "SYN|ACK", "SYN|ACK|ECE",
      "PSH|ACK", "ACK", "FIN|ACK", "RST", "SYN|NS").toDF("tcp_flags")
    val syns = df.filter(graft.pcap.TcpFlag.synNoAck($"tcp_flags"))
      .as[String].collect().toSet
    assert(syns == Set("SYN", "SYN|ECE|CWR", "SYN|NS"))
    val synAcks = df.filter(graft.pcap.TcpFlag.synAck($"tcp_flags"))
      .as[String].collect().toSet
    assert(synAcks == Set("SYN|ACK", "SYN|ACK|ECE"))
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    // one hot key (0) carrying ~90% of the left side; wide payload so the
    // hot partition crosses the (lowered) skew threshold
    // payload must survive the shuffle and resist compression, or the
    // hot partition never crosses the skew threshold: 4 chained md5s of
    // the row id ~ 128 incompressible bytes per row
    val left = spark.range(0, 20000)
      .select((when($"id" % 10 === 0, $"id" % 97).otherwise(0L)).as("k"),
        concat(md5($"id".cast("string")), md5(($"id" + 1).cast("string")),
          md5(($"id" + 2).cast("string")), md5(($"id" + 3).cast("string")))
          .as("pad"))
    val right = spark.range(0, 97).select($"id".as("k"),
      ($"id" * 2).as("v"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val joined = left.join(right, "k")
      // execute THIS plan (count() would plan a separate query execution
      // whose adaptive plan is the one that finalizes)
      assert(joined.collect().length == 20000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      // AQE marks the rewritten join and the split shuffle read
      assert(finalPlan.contains("skew=true"), finalPlan.take(2000))
    } finally {
      Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled")
        .foreach(spark.conf.unset)
    }
  }

  test("ts-bounded pcap scans prune whole files from planning") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tsprune")
    def write(name: String, base: Long): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        graft.pcap.PcapSynth.file((0 until 4).map(i =>
          (base + i, 0L, graft.pcap.PcapSynth.synthFrame(i)))))
    write("a.pcap", 1000L)
    write("b.pcap", 2000L)
    write("c.pcap", 3000L)
    // a pcapng file exercises the stats tool's full-decode fallback
    // (no classic record chain to header-walk)
    java.nio.file.Files.write(dir.resolve("d.pcapng"),
      graft.pcap.PcapSynth.fileNg(Seq(1), (0 until 4).map(i =>
        (0, (4000L + i) * 1000000L, graft.pcap.PcapSynth.synthFrame(i)))))
    // ETL-side sidecar generation (exact min/max header walk) ...
    graft.tools.PcapStatsWriter.main(Array(dir.toString))
    assert(new String(java.nio.file.Files.readAllBytes(
      dir.resolve("a.pcap.tsidx"))).trim == "1000 1003 4")
    assert(new String(java.nio.file.Files.readAllBytes(
      dir.resolve("d.pcapng.tsidx"))).trim == "4000 4003 4")
    // ... but leave c.pcap statless to exercise the no-stats path
    java.nio.file.Files.delete(dir.resolve("c.pcap.tsidx"))
    // 1-byte bins -> one file per partition, so the partition count IS
    // the planned-file count
    def scan(opts: (String, String)*) = {
      var r = spark.read.format("pcap").option("maxBytesPerPartition", "1")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(dir.toString).filter($"ts" >= 2000 && $"ts" <= 2003)
    }
    val off = scan("tsPruning" -> "false")
    assert(off.count() == 4)
    assert(off.rdd.getNumPartitions == 4, "opt-out must plan every file")
    val side = scan()
    assert(side.count() == 4)
    assert(side.rdd.getNumPartitions == 2,
      "sidecar stats must prune a.pcap and d.pcapng; statless c.pcap " +
        "must survive")
    val mono = scan("assumeMonotonicTs" -> "true")
    assert(mono.count() == 4)
    assert(mono.rdd.getNumPartitions == 1,
      "first/last probe must also prune the statless file under the " +
        "monotonicity opt-in")
  }

  test("typed packet Dataset decodes with case-class access") {
    val fixture = getClass.getResource("/test.pcap").getPath
    val ds = graft.pcap.PcapIO.packets(spark, fixture,
      graft.pcap.DecodeOptions.dns)
    val recs = ds.collect().sortBy(_.tsMicro)
    assert(recs.length == 2)
    assert(recs.head.dstPort.contains(53))
    assert(recs.head.dns.exists(_.qname.contains("ripe.net.")))
    // typed filter pipeline
    assert(ds.filter(_.protocol.contains("UDP")).count() == 2)
  }
}
