package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 batch-1 operators, checked against direct independent
  * re-derivations (the Round8OpsSpec pattern) plus plan-shape gates:
  *
  *   - pipeline_merge_upsert: latest-wins CDC semantics on targeted
  *     doc histories (tombstone wins, resurrect wins over tombstone,
  *     untouched rows survive at v1), exactly ONE exchange (the argmax
  *     groupBy — no window sort in the plan).
  *   - mm_audio_quality: counts re-derived from the decoded PCM by an
  *     independent loop; keep flag equals the ratio rule.
  *   - text_gopher_rules: per-rule flags re-derived from a direct
  *     string-level implementation of the decorated document; the op
  *     is a pure projection (ZERO exchanges).
  */
class Round11OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  private def collectNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val self = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        return collectNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectNodes)
  }

  private def nExchanges(df: org.apache.spark.sql.DataFrame): Int =
    collectNodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[Exchange])

  // ------------------------------------------------------------------
  // pipeline_merge_upsert
  // ------------------------------------------------------------------

  test("merge_upsert: targeted doc histories resolve latest-wins") {
    import spark.implicits._
    val out = q("pipeline_merge_upsert")
      .select($"doc_id", $"version").as[(Long, Long)].collect().toMap
    val texts = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toMap
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

    // doc 0: v1 upsert, v2 TOMBSTONE (0 % 13 == 0), v3 resurrect
    // (0 % 26 == 0) -> survives at version 3 with the ' back' text
    assert(out(0L) == 3L)
    val h0 = q("pipeline_merge_upsert")
      .filter("doc_id = 0").select("h").as[String].head()
    assert(h0 == md5(texts(0L) + " back"))

    // doc 13: tombstoned at v2, never resurrected -> absent
    assert(!out.contains(13L))
    // doc 26: tombstoned at v2 (26 % 13 == 0), resurrected at v3
    assert(out(26L) == 3L)
    // doc 5: re-crawled at v2 only -> version 2
    assert(out(5L) == 2L)
    // doc 1: untouched -> version 1
    assert(out(1L) == 1L)
    // doc 10: v2 re-crawl + v3 re-crawl -> version 3, ' rev3' text
    assert(out(10L) == 3L)
  }

  test("merge_upsert: one exchange, no window sort") {
    val df = q("pipeline_merge_upsert")
    assert(nExchanges(df) == 1,
      s"expected exactly 1 exchange (the argmax groupBy):\n" +
        df.queryExecution.executedPlan)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "latest-wins must be an argmax aggregate, not a row_number window")
  }

  // ------------------------------------------------------------------
  // mm_audio_quality
  // ------------------------------------------------------------------

  test("audio_quality: counts match an independent PCM recount") {
    import spark.implicits._
    val got = q("mm_audio_quality")
      .select($"media_id", $"n_silent", $"n_clipped", $"keep")
      .as[(Long, Int, Int, Boolean)].collect()
    assert(got.nonEmpty)
    for ((id, silent, clipped, keep) <- got.take(40)) {
      val a = operators.Multimodal.WavCodec.decode(
        operators.Multimodal.WavCodec.encode(id))
      val abs = a.samples.map(v => math.abs(v.toInt))
      assert(silent == abs.count(_ < 1024), s"id=$id silent")
      assert(clipped == abs.count(_ >= 32256), s"id=$id clipped")
      assert(keep == (10L * silent <= abs.length &&
        50L * clipped <= abs.length), s"id=$id keep")
    }
    // both decision outcomes occur on the fixture
    assert(got.exists(_._4) && got.exists(!_._4),
      "keep must discriminate on the fixture")
  }

  // ------------------------------------------------------------------
  // text_gopher_rules
  // ------------------------------------------------------------------

  /** Direct string-level re-derivation of the decorated document and
    * its rule flags, written against the op's doc comment (not its
    * code): decorate words, cut 8-word lines, prefix/suffix, then parse
    * the line strings back. */
  private def directGopher(docId: Long, text: String)
      : (Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean) = {
    val ws = text.toLowerCase.split(" ", -1)
    val dw = ws.zipWithIndex.map { case (w, i) =>
      if (docId % 19 == 6 && i % 2 == 0) "a"
      else if (docId % 7 == 1 && i % 6 == 5) "#"
      else if (docId % 9 == 3 && i % 4 == 3) "12345"
      else w
    }
    val lines = dw.grouped(8).zipWithIndex.map { case (g, li) =>
      val bullet =
        if (docId % 15 == 5 || (docId % 5 == 0 && li % 3 == 0)) "- " else ""
      val ell = if (docId % 6 == 2 && li % 2 == 1) "..." else ""
      bullet + g.mkString(" ") + ell
    }.toArray
    val n = dw.length
    val sumLen = dw.map(_.length).sum
    val nAlpha = dw.count(_.exists(c => c >= 'a' && c <= 'z'))
    val nHash = dw.count(_ == "#")
    val nl = lines.length
    val nBullet = lines.count(_.startsWith("- "))
    val nEll = lines.count(_.endsWith("..."))
    val nStop = (if (dw.contains("the")) 1 else 0) +
      (if (dw.contains("a")) 1 else 0)
    (n >= 50 && n <= 100000,
      3 * n <= sumLen && sumLen <= 10 * n,
      10 * nHash <= n,
      5 * nAlpha >= 4 * n,
      10 * nBullet <= 9 * nl,
      10 * nEll <= 3 * nl,
      nStop >= 2)
  }

  test("gopher_rules: flags match the direct re-derivation; both " +
      "outcomes occur per rule") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toMap
    val got = q("text_gopher_rules")
      .selectExpr("doc_id", "flag_words", "flag_wlen", "flag_symbol",
        "flag_alpha", "flag_bullets", "flag_ellipsis", "flag_stop")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean,
        Boolean)].collect()
    assert(got.length == texts.size)
    for ((id, fw, fl, fs, fa, fb, fe, fst) <- got) {
      val exp = directGopher(id, texts(id))
      assert((fw, fl, fs, fa, fb, fe, fst) == exp, s"doc $id")
    }
    // discrimination: every rule fails somewhere and passes somewhere
    val cols = Seq[((Long, Boolean, Boolean, Boolean, Boolean, Boolean,
      Boolean, Boolean)) => Boolean](
      _._2, _._3, _._4, _._5, _._6, _._7, _._8)
    for ((f, i) <- cols.zipWithIndex) {
      assert(got.exists(f) && got.exists(r => !f(r)),
        s"rule $i does not discriminate on the fixture")
    }
  }

  test("gopher_rules: pure projection — zero exchanges") {
    assert(nExchanges(q("text_gopher_rules")) == 0)
  }

  // ------------------------------------------------------------------
  // dedup_lsh_error_profile
  // ------------------------------------------------------------------

  test("lsh_error_profile: totals cover the candidate set and the " +
      "true-Jaccard margin matches a direct string-level re-derivation") {
    import spark.implicits._
    val profile = q("dedup_lsh_error_profile")
      .select($"n_match", $"jacc_decile", $"n_pairs")
      .as[(Int, Int, Long)].collect()
    val pairs = q("dedup_minhash_lsh")
      .select($"doc1", $"doc2").as[(Long, Long)].collect()
    // every candidate pair lands in exactly one histogram cell
    assert(profile.map(_._3).sum == pairs.length)

    // direct exact-Jaccard decile, from raw text (no minhash involved)
    val texts = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toMap
    def shingleSet(t: String): Set[String] = {
      val ws = t.toLowerCase.split("\\s+")
      if (ws.length < 3) Set.empty
      else (0 to ws.length - 3)
        .map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").toSet
    }
    val directDeciles = pairs.map { case (d1, d2) =>
      val s1 = shingleSet(texts(d1)); val s2 = shingleSet(texts(d2))
      val common = (s1 & s2).size
      ((10L * common) / (s1.size + s2.size - common)).toInt
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val profileDeciles = profile.groupBy(_._2)
      .map { case (k, v) => k -> v.map(_._3).sum }
    assert(profileDeciles == directDeciles,
      s"profile margin $profileDeciles vs direct $directDeciles")
    // the calibration surface is non-degenerate on this corpus: both a
    // high-estimate/high-true cell and a low-true cell exist
    assert(profile.exists(c => c._1 >= 6 && c._2 >= 8))
    assert(profile.exists(c => c._2 == 0))
  }

  // ------------------------------------------------------------------
  // text_token_fertility
  // ------------------------------------------------------------------

  test("token_fertility: group sums equal the per-doc tokenizer " +
      "output folded by (lang, source)") {
    import spark.implicits._
    val perDoc = q("text_bpe_apply")
      .select($"doc_id", $"tok_after").as[(Long, Long)].collect().toMap
    val meta = Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang", "source", "size(split(text, ' '))")
      .as[(Long, String, String, Int)].collect()
    val want = meta.groupBy(r => (r._2, r._3)).map { case (k, v) =>
      k -> (v.length.toLong, v.map(_._4.toLong).sum,
        v.map(r => perDoc(r._1)).sum)
    }
    val got = q("text_token_fertility")
      .select($"lang", $"source", $"n_docs", $"sum_words", $"sum_tokens")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == want)
  }

  // ------------------------------------------------------------------
  // q53_hourly_anomaly
  // ------------------------------------------------------------------

  test("hourly_anomaly: flags match a direct median/MAD re-derivation " +
      "from raw hourly counts") {
    import spark.implicits._
    val got = q("q53_hourly_anomaly")
      .selectExpr("event_type", "cast(hour as long)", "c", "is_anomaly")
      .as[(String, Long, Long, Boolean)].collect()
    // direct: fold events to hourly counts, then median/MAD per type
    val hourly = Tables.events(spark, sf)
      .selectExpr("event_type",
        "cast(date_trunc('hour', ts) as long) AS h")
      .as[(String, Long)].collect()
      .groupBy(identity).map { case ((t, h), v) => (t, h, v.length.toLong) }
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    val byType = hourly.groupBy(_._1)
    val want = byType.flatMap { case (t, rows) =>
      val cs = rows.map(_._3).toSeq
      val m2 = med2(cs)
      val mad4 = med2(cs.map(c => math.abs(2 * c - m2)))
      rows.map(r => (t, r._2, r._3) ->
        (2 * math.abs(2 * r._3 - m2) > 3 * mad4))
    }
    assert(got.length == want.size)
    got.foreach { case (t, h, c, a) =>
      assert(want((t, h, c)) == a, s"($t,$h,$c)")
    }
    assert(got.exists(_._4) && got.exists(!_._4))
  }

  // ------------------------------------------------------------------
  // sim_embedding_qc
  // ------------------------------------------------------------------

  test("embedding_qc: per-label defect counts equal the population " +
      "arithmetic over vec_ids; totals conserve") {
    import spark.implicits._
    val ids = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label").as[(Long, Int)].collect()
    val want = ids.groupBy(_._2).map { case (l, v) =>
      val zero = v.count(_._1 % 17 == 3)
      val bad = v.count(r => r._1 % 17 != 3 && r._1 % 23 == 5)
      val un = v.count(r =>
        r._1 % 17 != 3 && r._1 % 23 != 5 && r._1 % 29 == 7)
      l -> ((v.length.toLong, bad.toLong, zero.toLong, un.toLong))
    }
    val got = q("sim_embedding_qc")
      .select($"label", $"n_vecs", $"n_bad_dim", $"n_zero",
        $"n_unnormalized", $"n_healthy")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (l, n, bad, zero, un, healthy) =>
      assert(want(l) == ((n, bad, zero, un)), s"label $l")
      assert(healthy == n - bad - zero - un, s"label $l conservation")
    }
    // every defect class non-empty corpus-wide
    assert(got.map(_._3).sum > 0 && got.map(_._4).sum > 0 &&
      got.map(_._5).sum > 0)
  }

  // ------------------------------------------------------------------
  // pipeline_dedup_impact
  // ------------------------------------------------------------------

  test("dedup_impact: report columns reconcile with the individual " +
      "dedup tools it summarizes") {
    import spark.implicits._
    val report = q("pipeline_dedup_impact")
      .select($"source", $"n_docs", $"n_exact_dup", $"sum_chunks",
        $"sum_dup_chunks", $"n_near_dup")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val srcOf = Tables.documents(spark, sf)
      .selectExpr("doc_id", "source").as[(Long, String)].collect().toMap
    // near-dup margin == distinct membership of the LSH pair query
    val pairs = q("dedup_minhash_lsh")
      .select($"doc1", $"doc2").as[(Long, Long)].collect()
    val nearBySrc = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(srcOf).view.mapValues(_.length.toLong).toMap
    report.foreach { case (src, (_, _, _, _, near)) =>
      assert(near == nearBySrc.getOrElse(src, 0L), s"source $src")
    }
    // chunk margin == dedup_chunk folded by source
    val chunk = q("dedup_chunk")
      .selectExpr("doc_id", "n_chunks", "n_dup")
      .as[(Long, Long, Long)].collect()
    val chunkBySrc = chunk.groupBy(r => srcOf(r._1)).view
      .mapValues(v => (v.map(_._2).sum, v.map(_._3).sum)).toMap
    report.foreach { case (src, (_, _, sc, sdc, _)) =>
      assert((sc, sdc) == chunkBySrc(src), s"source $src chunks")
    }
    // totals conserve over the corpus
    assert(report.values.map(_._1).sum == srcOf.size)
  }

  // ------------------------------------------------------------------
  // pipeline_graph_kcore
  // ------------------------------------------------------------------

  test("kcore: equals a direct in-memory peel; every survivor keeps " +
      "degree >= 3 inside the core") {
    import spark.implicits._
    // sf0.01: the scale where the thresholded graph actually peels
    // (the sf0.001 graph's 3-core is ~the whole graph — no fringe)
    val sf01 = "/root/testdata/sf0.01"
    val li = Tables.lineitem(spark, sf01)
      .selectExpr("l_orderkey", "l_partkey").as[(Long, Long)]
      .collect().distinct
    val byOrder = li.groupBy(_._1).values
    var edges = byOrder.flatMap { ps =>
      val parts = ps.map(_._2).distinct.toSeq
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    var stable = false
    var rounds = 0
    while (!stable) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 3).keySet
      val e2 = edges.filter(e => keep(e._1) && keep(e._2))
      if (e2.size == edges.size) stable = true
      else { edges = e2; rounds += 1 }
    }
    assert(rounds > 0 && rounds <= 16,
      s"peel took $rounds rounds — oracle unroll must cover it")
    val want = edges.groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("pipeline_graph_kcore")(spark, sf01)
      .select($"node", $"core_degree").as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got.nonEmpty && got.values.forall(_ >= 3))
    // the peel actually removed something (fringe existed)
    val allNodes = li.map(_._2).distinct.length
    assert(got.size < allNodes, "fixture has no fringe to peel")
  }

  // ------------------------------------------------------------------
  // q54_concurrency
  // ------------------------------------------------------------------

  test("concurrency: the two-level prefix sum equals a naive global " +
      "boundary sweep") {
    import spark.implicits._
    // naive direct sweep: sessions from the q19 gap rule, all
    // boundaries sorted globally, one running sum, per-hour max
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts)")
      .as[(Long, Long, Long)].collect()
    val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ts = rows.sortBy(_._2).map(_._3)
      var start = ts.head; var prev = ts.head
      for (t <- ts.tail) {
        if (t - prev > 1800000000L) {
          bounds += ((start, 1L)); bounds += ((prev, -1L))
          start = t
        }
        prev = t
      }
      bounds += ((start, 1L)); bounds += ((prev, -1L))
    }
    val perUs = bounds.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var run = 0L
    val hourMax = scala.collection.mutable.Map.empty[Long, Long]
    for ((us, net) <- perUs) {
      run += net
      val hour = us - us % 3600000000L
      hourMax(hour) = math.max(hourMax.getOrElse(hour, Long.MinValue), run)
    }
    val got = q("q54_concurrency")
      .selectExpr("unix_micros(hour)", "max_concurrent")
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == hourMax.keySet)
    got.foreach { case (h, m) => assert(hourMax(h) == m, s"hour $h") }
    assert(got.values.max > 1L, "fixture must overlap sessions")
  }

  // ------------------------------------------------------------------
  // sim_label_noise
  // ------------------------------------------------------------------

  test("label_noise: majority labels match a direct vote over the " +
      "shared kmeans assignment; disagreement accounting conserves") {
    import spark.implicits._
    val asg = SparkEntry.queries("sim_kmeans_cluster")(spark, sf)
      .selectExpr("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val labels = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label").as[(Long, Int)].collect().toMap
    val want = asg.groupBy(_._2).map { case (cl, members) =>
      val ls = members.keys.toSeq.map(labels)
      val votes = ls.groupBy(identity).map { case (l, v) => (l, v.size) }
      val maj = votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      cl -> ((maj, ls.size.toLong, ls.count(_ != maj).toLong))
    }
    val got = q("sim_label_noise")
      .select($"cluster", $"majority_label", $"n_members", $"n_disagree")
      .as[(Long, Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == want)
    // every vector is in exactly one cluster row
    assert(got.values.map(_._2).sum == labels.size)
  }

  // ------------------------------------------------------------------
  // text_vocab_growth
  // ------------------------------------------------------------------

  test("vocab_growth: deciles match a direct first-seen fold and the " +
      "curve is genuinely sublinear on the fixture") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
    val nDocs = docs.length.toLong
    val first = scala.collection.mutable.Map.empty[String, Long]
    for ((id, text) <- docs) {
      val ws = text.toLowerCase.split("\\s+")
      if (ws.length >= 3)
        for (i <- 0 to ws.length - 3) {
          val g = s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}"
          first(g) = math.min(first.getOrElse(g, Long.MaxValue), id)
        }
    }
    val want = first.values
      .groupBy(fd => math.min(fd * 10 / nDocs, 9L).toInt)
      .view.mapValues(_.size.toLong).toMap
    val got = q("text_vocab_growth")
      .select($"decile", $"new_phrases", $"cum_vocab")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.map(r => r._1 -> r._2).toMap == want)
    // running sum is consistent
    assert(got.map(_._2).scanLeft(0L)(_ + _).tail.toSeq ==
      got.map(_._3).toSeq)
    // Heaps: later deciles add less than the first
    assert(got.last._2 < got.head._2)
  }

  // ------------------------------------------------------------------
  // sim_covariance_exact
  // ------------------------------------------------------------------

  test("covariance: integer sums match a direct floored re-derivation") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("embedding").as[Array[Float]].collect()
      .map(_.map(x => math.floor(x.toDouble * 1000).toLong))
    val got = q("sim_covariance_exact")
      .select($"dim_i", $"dim_j", $"n", $"sum_i", $"sum_j", $"sum_prod")
      .as[(Int, Int, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    val dim = vecs.head.length
    assert(got.size == dim * (dim + 1) / 2)
    // spot-check a spread of pairs incl. the diagonal and the corners
    for ((i, j) <- Seq((0, 0), (0, 1), (5, 40), (63, 63), (0, 63),
        (31, 32))) {
      val want = (vecs.length.toLong,
        vecs.map(_(i)).sum, vecs.map(_(j)).sum,
        vecs.map(v => v(i) * v(j)).sum)
      assert(got((i, j)) == want, s"pair ($i,$j)")
    }
    // diagonal second moments are positive (unit-norm data)
    assert((0 until dim).forall(i => got((i, i))._4 > 0))
  }

  // ------------------------------------------------------------------
  // sim_ann_recall_eval
  // ------------------------------------------------------------------

  test("ann_recall_eval: every query scored, hits bounded by k, and " +
      "the sf0.001 fixture's deterministic recall reproduced") {
    import spark.implicits._
    val got = q("sim_ann_recall_eval")
      .select($"qid", $"n_hits", $"recall")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val qids = Tables.embeddings(spark, sf)
      .filter("vec_id % 50 = 0").selectExpr("vec_id")
      .as[Long].collect().sorted
    assert(got.map(_._1).toSeq == qids.toSeq)
    got.foreach { case (qid, h, r) =>
      assert(h >= 0 && h <= 5 && r == h / 5.0, s"qid $qid")
    }
    // deterministic index + deterministic fixture -> exact total
    assert(got.map(_._2).sum == 48L,
      s"recall drifted: ${got.map(r => s"${r._1}:${r._2}").mkString(",")}")
  }

  // ------------------------------------------------------------------
  // mm_shot_boundaries
  // ------------------------------------------------------------------

  test("shot_boundaries: detected shot starts are exactly the " +
      "fixture's even frames, per video") {
    import spark.implicits._
    val got = q("mm_shot_boundaries")
      .select($"media_id", $"frame_idx").as[(Long, Int)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val vids = Tables.documents(spark, sf)
      .filter("doc_id % 3 = 2").selectExpr("doc_id").as[Long].collect()
    assert(got.keySet == vids.toSet)
    for (id <- vids) {
      val nf = operators.Multimodal.AviCodec.nFrames(id)
      assert(got(id) == (0 until nf by 2).toSet,
        s"video $id: ${got(id)} vs expected ${(0 until nf by 2).toSet}")
    }
  }

  // ------------------------------------------------------------------
  // pcap_tcp_syn_options
  // ------------------------------------------------------------------

  test("tcp_syn_options: inventory recounts from the synth templates, " +
      "and the row path agrees with the columnar path") {
    import spark.implicits._
    val got = q("pcap_tcp_syn_options")
      .select($"tcp_mss", $"tcp_wscale", $"tcp_sack_ok", $"tcp_ts_ok",
        $"n_syn", $"n_hosts")
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)),
        r.getBoolean(2), r.getBoolean(3), r.getLong(4), r.getLong(5)))
      .toSet
    // replay the synth population (240 SYNs, 4 templates x 5 MSS values)
    val acc = scala.collection.mutable.Map
      .empty[(Option[Any], Option[Any], Boolean, Boolean), Long]
    for (i <- 0 until 240) {
      val mss = 1400 + (i % 5) * 20
      val k = (i % 4) match {
        case 0 => (Option[Any](mss), Option[Any](7), true, true)
        case 1 => (Option[Any](mss), Option[Any](8), true, false)
        case 2 => (Option[Any](mss), Option[Any](6), true, true)
        case _ => (Option.empty[Any], Option.empty[Any], false, false)
      }
      acc(k) = acc.getOrElse(k, 0L) + 1L
    }
    val want = acc.map { case ((m, w, sk, ts), c) =>
      (m, w, sk, ts, c, c)
    }.toSet
    assert(got == want)
    // row-path parity: the same scan with columnar=false must agree
    val path = "/tmp/graft_synth_synopt.pcap"
    val cols = Seq("tcp_mss", "tcp_wscale", "tcp_sack_ok", "tcp_ts_ok",
      "tcp_flags", "src")
    def rows(columnar: Boolean) = spark.read.format("pcap")
      .option("columnar", columnar.toString).load(path)
      .select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(rows(columnar = true).toSeq == rows(columnar = false).toSeq)
  }

  // ------------------------------------------------------------------
  // pcap_dns_spoof_candidates
  // ------------------------------------------------------------------

  test("dns_spoof: per-resolver counts match an independent decode-and-" +
      "correlate over the raw capture") {
    import spark.implicits._
    val got = q("pcap_dns_spoof_candidates")
      .select($"resolver", $"n_query", $"n_resp", $"n_orphan", $"n_race")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // independent path: decode every packet with the stream reader and
    // correlate in plain Scala (no Spark, no oracle arithmetic)
    val pkts = {
      val in = new java.io.FileInputStream("/tmp/graft_synth_dnsspoof.pcap")
      try new graft.pcap.PcapStreamReader(in,
        graft.pcap.DecodeOptions.dns).toList
      finally in.close()
    }
    case class Key(client: String, cport: Int, resolver: String, txid: Int)
    val queries = pkts.filter(p => p.dns.exists(!_.qr)).map(p =>
      Key(p.src.get, p.srcPort.get, p.dst.get, p.dns.get.queryId)).toSet
    val resps = pkts.filter(p => p.dns.exists(_.qr)).map(p =>
      (Key(p.dst.get, p.dstPort.get, p.src.get, p.dns.get.queryId),
        p.dns.get.answer.mkString("|")))
    val want = queries.groupBy(_.resolver).map { case (r, qs) =>
      val rs = resps.filter(_._1.resolver == r)
      val orphans = rs.count(x => !queries.contains(x._1))
      val races = rs.filter(x => queries.contains(x._1))
        .groupBy(_._1).count(_._2.map(_._2).distinct.size > 1)
      r -> (qs.size.toLong, rs.size.toLong, orphans.toLong, races.toLong)
    }
    assert(got == want)
    // the fixture genuinely exercises both anomaly classes
    assert(got.values.map(_._3).sum > 0 && got.values.map(_._4).sum > 0)
  }

  // ------------------------------------------------------------------
  // sim_knn_graph
  // ------------------------------------------------------------------

  test("knn_graph: edges match an in-memory exact kNN and mutual flags " +
      "are exactly the reciprocated pairs") {
    import spark.implicits._
    val got = q("sim_knn_graph")
      .select($"src", $"dst", $"rn", $"mutual")
      .as[(Long, Long, Int, Boolean)].collect()
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    // exact top-3 per src, score desc then id asc — the TopKByScore order
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dotd(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i).toDouble * y(i))
      dotd(a, b) / (math.sqrt(dotd(a, a)) * math.sqrt(dotd(b, b)))
    }
    val wantEdges = vecs.keys.flatMap { s0 =>
      vecs.keys.filter(_ != s0).toSeq
        .map(c => (c, cos(vecs(s0), vecs(c))))
        .sortBy { case (c, sc) => (-sc, c) }.take(3).zipWithIndex
        .map { case ((c, _), i) => (s0, c, i + 1) }
    }.toSet
    assert(got.map(t => (t._1, t._2, t._3)).toSet == wantEdges)
    val edgeSet = wantEdges.map(e => (e._1, e._2))
    got.foreach { case (s0, c, _, m) =>
      assert(m == edgeSet.contains((c, s0)), s"edge $s0->$c")
    }
    // sanity: the fixture has both mutual and one-way edges
    assert(got.exists(_._4) && got.exists(!_._4))
  }

  // ------------------------------------------------------------------
  // dedup_source_overlap
  // ------------------------------------------------------------------

  test("source_overlap: the matrix is exactly dedup_minhash_lsh's pair " +
      "surface folded by source pair") {
    import spark.implicits._
    val got = q("dedup_source_overlap")
      .select($"source_a", $"source_b", $"n_pairs")
      .as[(String, String, Long)].collect().toSet
    val srcOf = Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val want = q("dedup_minhash_lsh")
      .select($"doc1", $"doc2").as[(Long, Long)].collect()
      .groupBy { case (a, b) =>
        val (s1, s2) = (srcOf(a), srcOf(b))
        if (s1 <= s2) (s1, s2) else (s2, s1)
      }
      .map { case ((a, b), ps) => (a, b, ps.length.toLong) }.toSet
    assert(got == want)
    // conservation: cell counts sum to the full pair surface
    assert(got.toSeq.map(_._3).sum == q("dedup_minhash_lsh").count())
  }

  // ------------------------------------------------------------------
  // text_quality_calibration
  // ------------------------------------------------------------------

  test("quality_calibration: deciles match a direct string-level " +
      "re-derivation and doc counts conserve") {
    import spark.implicits._
    val got = q("text_quality_calibration")
      .select($"decile", $"n_docs", $"n_gold")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang")
      .as[(Long, String, String)].collect()
    def bucketOf(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1024L
    }
    val want = docs.map { case (_, text, lang) =>
      val toks = text.toLowerCase.split(" ", -1).filter(_.nonEmpty)
      val sumMicro = toks.map(t => bucketOf(t) * 2654435761L % 2000001L
        - 1000000L).sum
      val n = toks.length.toLong
      val decile = (sumMicro + 1000000L * n) * 10L / (2000001L * n)
      (decile, lang == "en")
    }.groupBy(_._1).map { case (dec, xs) =>
      dec -> (xs.length.toLong, xs.count(_._2).toLong)
    }
    assert(got == want)
    assert(got.values.map(_._1).sum == docs.length.toLong)
  }

  // ------------------------------------------------------------------
  // pipeline_cluster_weights
  // ------------------------------------------------------------------

  test("cluster_weights: every doc weighted once, weights are exactly " +
      "1e6 div cluster size, and clusters match dedup_components") {
    import spark.implicits._
    val got = q("pipeline_cluster_weights")
      .select($"doc_id", $"component", $"cluster_size", $"weight_ppm")
      .as[(Long, Long, Long, Long)].collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(got.length == nDocs)
    assert(got.map(_._1).distinct.length == nDocs)
    // weight formula holds row by row
    got.foreach { case (id, _, sz, w) =>
      assert(w == 1000000L / sz, s"doc $id: $w vs ${1000000L / sz}")
    }
    // cluster_size is consistent: every member of a component reports
    // the component's cardinality
    val byComp = got.groupBy(_._2)
    byComp.foreach { case (c, members) =>
      assert(members.forall(_._3 == members.length), s"component $c")
    }
    // non-singleton components agree with dedup_components' labeling
    val comps = q("dedup_components")
      .select($"doc_id", $"component").as[(Long, Long)].collect().toMap
    got.foreach { case (id, c, sz, _) =>
      if (comps.contains(id)) assert(comps(id) == c, s"doc $id")
      else assert(c == id && sz == 1L, s"singleton $id")
    }
  }

  // ------------------------------------------------------------------
  // q55_rfm_segments
  // ------------------------------------------------------------------

  test("rfm: segment census matches a direct fold; score maps broadcast") {
    import spark.implicits._
    val df = q("q55_rfm_segments")
    val got = df
      .select($"r_score", $"f_score", $"m_score", $"n_customers",
        $"monetary_cents")
      .as[(Int, Int, Int, Long, Long)].collect().toSet

    // direct in-memory re-derivation from raw orders, no Spark math
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS dt",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .as[(Long, java.sql.Date, Long)].collect()
    val epoch = java.time.LocalDate.parse("1992-01-01")
    val pc = orders.groupBy(_._1).map { case (ck, rows) =>
      val rDay = java.time.temporal.ChronoUnit.DAYS.between(
        epoch, rows.map(_._2.toLocalDate).max(Ordering.fromLessThan[
          java.time.LocalDate](_ isBefore _))).toInt
      (ck, rDay, rows.length.toLong, rows.map(_._3).sum)
    }.toVector
    val n = pc.length.toLong
    def scoreOf[K: Ordering](vals: Vector[K]): Map[K, Int] = {
      val hist = vals.groupBy(identity).view.mapValues(_.size.toLong)
        .toVector.sortBy(_._1)
      var below = 0L
      hist.map { case (v, c) =>
        val s = (1L + (5L * below) / n).toInt; below += c; v -> s
      }.toMap
    }
    val rS = scoreOf(pc.map(_._2))
    val fS = scoreOf(pc.map(_._3))
    val mS = scoreOf(pc.map(_._4 / 500000L))
    val exp = pc.groupBy(c =>
        (rS(c._2), fS(c._3), mS(c._4 / 500000L)))
      .map { case ((r, f, m), cs) =>
        (r, f, m, cs.length.toLong, cs.map(_._4).sum) }.toSet
    assert(got == exp)
    // all scores in 1..5 and every quintile populated on each axis
    assert(got.forall(t => Seq(t._1, t._2, t._3)
      .forall(s => s >= 1 && s <= 5)))
    assert(got.map(_._3).toSeq.distinct.sorted == Seq(1, 2, 3, 4, 5))
    // the three score maps ride broadcast joins — a sort-merge join
    // here would mean the tiny histograms got shuffled like facts
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  // ------------------------------------------------------------------
  // sim_ivf_balance
  // ------------------------------------------------------------------

  test("ivf balance: entries conserve A x corpus; ppm shares sum to 1M") {
    import spark.implicits._
    val got = q("sim_ivf_balance")
      .select($"list_id", $"n_entries", $"share_ppm")
      .as[(Int, Long, Long)].collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    // every vector lands in exactly A = 3 lists (K = 8 >= A), so the
    // report's entry total IS the multi-assignment invariant
    assert(got.map(_._2).sum == 3 * nVecs)
    assert(got.forall(r => r._1 >= 0 && r._1 < 8))
    assert(got.map(_._1).distinct.length == got.length)
    // floor-division shares: within K of a full million, never over
    val ppm = got.map(_._3).sum
    assert(ppm <= 1000000L && ppm >= 1000000L - got.length)
    // share formula holds row by row against the reported totals
    val tot = got.map(_._2).sum
    got.foreach(r => assert(r._3 == r._2 * 1000000L / tot))
  }

  // ------------------------------------------------------------------
  // text_keyword_topk
  // ------------------------------------------------------------------

  test("keyword topk: per-doc terms match a direct string-level fold") {
    import spark.implicits._
    val got = q("text_keyword_topk")
      .select($"doc_id", $"term", $"tf", $"df", $"rank")
      .as[(Long, String, Long, Long, Int)].collect()
    val texts = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
    // direct re-derivation: whitespace split, tf per doc, df over docs
    val tfm = texts.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val dfm = tfm.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val exp = tfm.flatMap { case (id, tf) =>
      tf.toSeq.map { case (w, c) => (w, c, dfm(w)) }
        .sortBy { case (w, c, df) => (-c, df, w) }
        .take(3).zipWithIndex
        .map { case ((w, c, df), i) => (id, w, c, df, i + 1) }
    }.toSet
    assert(got.toSet == exp)
    // every doc with any token contributes exactly its top-k rows
    assert(got.groupBy(_._1).forall { case (id, rows) =>
      rows.length == math.min(3, tfm(id).size) })
  }

  // ------------------------------------------------------------------
  // sim_pq_distortion
  // ------------------------------------------------------------------

  test("pq distortion: all 16 subspaces cover every code entry") {
    import spark.implicits._
    val got = q("sim_pq_distortion")
      .select($"m", $"n_codes", $"dist_sum_micro", $"dist_max_micro")
      .as[(Int, Long, Long, Long)].collect()
    assert(got.map(_._1).sorted.toSeq == (0 until 16))
    // every subspace scores every (vector, assigned-list) entry — the
    // same population the balance report counts (A = 3 per vector)
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(got.forall(_._2 == 3 * nVecs))
    // micro-unit sums are consistent: non-negative, max <= sum,
    // and a nonzero quantization error exists somewhere (a perfect
    // codebook on continuous data would mean the fold broke)
    got.foreach { r =>
      assert(r._3 >= 0 && r._4 >= 0 && r._4 <= r._3)
    }
    assert(got.map(_._3).sum > 0)
  }

  // ------------------------------------------------------------------
  // q56_attribution
  // ------------------------------------------------------------------

  test("attribution: census matches a direct per-user journey replay") {
    import spark.implicits._
    val got = q("q56_attribution")
      .select($"first_touch", $"last_touch", $"n_conversions",
        $"value_cents")
      .as[(String, String, Long, Long)].collect().toSet
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us", "event_id",
        "CAST(floor(value * 100) AS BIGINT) AS cents")
      .as[(Long, String, Long, Long, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val rows = byUser.toSeq.flatMap { case (_, es) =>
      val purchases = es.filter(_._2 == "purchase")
        .sortBy(e => (e._3, e._4))
      purchases.headOption.map { p =>
        val before = es.filter(e => e._2 != "purchase" &&
          (e._3 < p._3 || (e._3 == p._3 && e._4 < p._4)))
          .sortBy(e => (e._3, e._4))
        val ft = before.headOption.map(_._2).getOrElse("direct")
        val lt = before.lastOption.map(_._2).getOrElse("direct")
        (ft, lt, p._5)
      }
    }
    val exp = rows.groupBy(r => (r._1, r._2)).map { case ((f, l), rs) =>
      (f, l, rs.size.toLong, rs.map(_._3).sum) }.toSet
    assert(got == exp)
    // conversion conservation: census totals = users with a purchase
    assert(got.toSeq.map(_._3).sum ==
      byUser.count(_._2.exists(_._2 == "purchase")))
  }

  // ------------------------------------------------------------------
  // pipeline_e2e_media
  // ------------------------------------------------------------------

  test("e2e media: census conserves the corpus and agrees with the " +
      "standalone component labeling") {
    import spark.implicits._
    val got = q("pipeline_e2e_media")
      .select($"split", $"n_images", $"n_represented", $"id_checksum")
      .as[(String, Long, Long, Long)].collect()
    val nImgs = Tables.documents(spark, sf).count()
    // conservation: every image is represented by exactly one kept
    // canonical; kept count never exceeds represented count
    assert(got.map(_._3).sum == nImgs)
    assert(got.forall(r => r._2 <= r._3))
    // the kept set IS the standalone labeling's canonical set: ids
    // where component == self (plus singletons), checksummed
    val comps = q("mm_dhash_components")
      .select($"media_id", $"component").as[(Long, Long)].collect().toMap
    val allIds = Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect()
    val canon = allIds.filter(id => comps.getOrElse(id, id) == id)
    assert(got.map(_._4).sum == canon.sum)
    assert(got.map(_._2).sum == canon.length)
  }

  // ------------------------------------------------------------------
  // dedup_threshold_sweep
  // ------------------------------------------------------------------

  test("threshold sweep: monotone in the cutoff and consistent with " +
      "the LSH query at its own threshold") {
    import spark.implicits._
    val got = q("dedup_threshold_sweep")
      .select($"t10", $"n_pairs", $"n_docs_flagged")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(5, 6, 7, 8, 9))
    // raising the cutoff can only shrink both counts
    got.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3)
    }
    // a pair flags at most 2 docs; a doc needs at least one pair
    got.foreach(r => assert(r._3 <= 2 * r._2 && (r._2 == 0) == (r._3 == 0)))
    // every sweep row is a subset of dedup_minhash_lsh's candidate set
    // (the same guarded chain, before any jaccard cutoff), and a
    // direct exact-jaccard fold over raw text reproduces each count
    val cands = q("dedup_minhash_lsh")
      .select($"doc1", $"doc2").as[(Long, Long)].collect()
    assert(got.forall(_._2 <= cands.length))
    val texts = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toMap
    // mirrors Dedup.shinglesOf exactly: split on \s+ (no empty filter),
    // docs under 3 words contribute nothing, distinct 3-grams
    def shingleSet(t: String): Set[String] = {
      val ws = t.toLowerCase.split("\\s+")
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val jacs = cands.map { case (a, b) =>
      val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
      val c = (sa & sb).size.toLong
      (a, b, c, sa.size + sb.size - c)
    }
    for (t <- 5 to 9) {
      val expPairs = jacs.filter(j => j._3 * 10 >= t * j._4)
      assert(got.find(_._1 == t).get._2 == expPairs.length, s"t=$t")
      assert(got.find(_._1 == t).get._3 ==
        expPairs.flatMap(j => Seq(j._1, j._2)).distinct.length, s"t=$t")
    }
  }

  // ------------------------------------------------------------------
  // pipeline_basket_lift
  // ------------------------------------------------------------------

  test("basket lift: rules match a direct basket fold; top-k plan") {
    import spark.implicits._
    val df = q("pipeline_basket_lift")
    val got = df.select($"src", $"dst", $"w", $"c1", $"c2", $"lift")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    // direct re-derivation from raw lineitem, same fixed op order
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").as[(Long, Long)]
      .collect().distinct
    val n = li.map(_._1).distinct.length.toLong
    val cnt = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairs = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toVector
    val rules = pairs.map { case ((a, b), w) =>
      (a, b, w, cnt(a), cnt(b), w.toDouble * n / cnt(a) / cnt(b))
    }.filter(_._6 > 1.0)
      .sortBy(r => (-r._6, r._1, r._2)).take(20).toSet
    assert(got == rules)
    // ranked-limit runs as TakeOrderedAndProject, not a global sort
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  // ------------------------------------------------------------------
  // pcap_flow_percentiles
  // ------------------------------------------------------------------

  test("flow percentiles: match a direct sort over the exported flows") {
    import spark.implicits._
    val got = q("pcap_flow_percentiles")
      .select($"dst", $"metric", $"n_flows", $"median", $"p90", $"p99")
      .as[(String, String, Long, Double, Long, Long)].collect().toSet
    val flows = q("pcap_flow_export")
      .selectExpr("dst", "CAST(n_bytes AS LONG) AS b",
        "last_ts - first_ts AS dur")
      .as[(String, Long, Long)].collect()
    def stats(vs: Seq[Long]): (Long, Double, Long, Long) = {
      val s0 = vs.sorted
      val m = s0.length
      val med = if (m % 2 == 1) s0(m / 2).toDouble
        else (s0(m / 2 - 1) + s0(m / 2)) / 2.0
      (m.toLong, med, s0((9 * m + 9) / 10 - 1),
        s0((99 * m + 99) / 100 - 1))
    }
    val exp = flows.groupBy(_._1).flatMap { case (dst, fs) =>
      val (nb, mb, p9b, p99b) = stats(fs.map(_._2).toSeq)
      val (_, md, p9d, p99d) = stats(fs.map(_._3).toSeq)
      Seq((dst, "bytes", nb, mb, p9b, p99b),
        (dst, "dur_us", nb, md, p9d, p99d))
    }.toSet
    assert(got == exp)
  }

  // ------------------------------------------------------------------
  // sim_duplicate_vectors
  // ------------------------------------------------------------------

  test("duplicate vectors: clusters match the fixture's defect rules") {
    dupVectorCheck(sf)
  }

  test("duplicate vectors at sf0.1: a retry copy of a zero-ruled " +
      "donor joins the zero cluster (needs vec_ids past 507)") {
    dupVectorCheck("/root/testdata/sf0.1", requireCopiedZero = true)
  }

  private def dupVectorCheck(dir: String,
      requireCopiedZero: Boolean = false): Unit = {
    import spark.implicits._
    val got = SparkEntry.queries("sim_duplicate_vectors")(spark, dir)
      .select($"cluster_id", $"n_copies", $"n_labels")
      .as[(Long, Long, Long)].collect()
    val ids = Tables.embeddings(spark, dir)
      .select($"vec_id").as[Long].collect().toSet
    // the zero cluster: every vec_id % 17 == 3, plus retry copies
    // whose donor is zero-ruled
    val copiedZeros = ids.filter(id => id % 31 == 11 &&
      (id - 11) % 17 == 3 && id % 17 != 3)
    if (requireCopiedZero)
      assert(copiedZeros.nonEmpty,
        "fixture too small to exercise the copied-zero path")
    val zeros = ids.filter(_ % 17 == 3) ++ copiedZeros
    val zeroRow = got.find(_._1 == zeros.min).get
    assert(zeroRow._2 == zeros.size)
    // retry pairs: copy + donor, excluding anything zero-ruled
    val pairs = ids.filter(id => id % 31 == 11 && ids((id - 11)) &&
      id % 17 != 3 && (id - 11) % 17 != 3)
    assert(got.length == 1 + pairs.size)
    pairs.foreach { id =>
      val r = got.find(_._1 == id - 11)
      assert(r.exists(_._2 == 2), s"copy of ${id - 11} missing")
    }
    // no spurious clusters: every reported cluster is accounted for
    assert(got.map(_._2).sum == zeros.size + 2 * pairs.size)
  }

  // ------------------------------------------------------------------
  // pipeline_filter_funnel
  // ------------------------------------------------------------------

  test("filter funnel: stage attrition chains and agrees with the " +
      "rule battery's flags") {
    import spark.implicits._
    val got = q("pipeline_filter_funnel")
      .select($"stage", $"rule", $"n_in", $"n_out", $"n_dropped")
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq(1 -> "words", 2 -> "wlen", 3 -> "symbol", 4 -> "alpha",
        5 -> "bullets", 6 -> "ellipsis", 7 -> "stop"))
    // the funnel CHAINS: each stage's n_in is the previous n_out, and
    // drops are non-negative
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._4, s"stage ${b._1} n_in != stage ${a._1} n_out")
    }
    got.foreach(r => assert(r._5 == r._3 - r._4 && r._5 >= 0))
    // endpoints agree with the battery: total docs in, keep count out
    val flags = q("text_gopher_rules")
      .select($"flag_words", $"keep").as[(Boolean, Boolean)].collect()
    assert(got.head._3 == flags.length)
    assert(got.head._4 == flags.count(_._1))
    assert(got.last._4 == flags.count(_._2))
    // the fixture makes every rule cut something somewhere... except
    // possibly the last stages; at least 3 rules must drop docs
    assert(got.count(_._5 > 0) >= 3)
  }

  // ------------------------------------------------------------------
  // sim_label_kappa
  // ------------------------------------------------------------------

  test("label kappa: matches a direct computation with the same " +
      "class-ordered fold") {
    import spark.implicits._
    val got = q("sim_label_kappa")
      .select($"n", $"n_agree", $"po", $"pe", $"kappa")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    val (n, nAgree, po, pe, kappa) = got.head
    val rows = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect()
    val k = rows.map(_._2).max + 1
    val ab = rows.map { case (id, a) =>
      (a, (a + (if (id % 7 == 0) 1 else 0)) % k) }
    assert(n == ab.length)
    assert(nAgree == ab.count(t => t._1 == t._2))
    assert(po == nAgree.toDouble / n)
    // expected agreement via the same sorted-class sequential fold
    val ca = ab.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cb = ab.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    var acc = 0.0
    (0 until k).foreach { c =>
      acc += (ca.getOrElse(c, 0L).toDouble / n) *
        (cb.getOrElse(c, 0L).toDouble / n)
    }
    assert(pe == acc)
    assert(kappa == (po - pe) / (1.0 - pe))
    // the ~1/7 disagreement population puts kappa well below 1 but
    // far above chance
    assert(kappa > 0.7 && kappa < 0.95)
  }

  // ------------------------------------------------------------------
  // mm_keyframes
  // ------------------------------------------------------------------

  test("keyframes: one per shot, consistent with the boundary set, " +
      "hash equals the boundary frame's hash") {
    import spark.implicits._
    val kf = q("mm_keyframes")
      .select($"media_id", $"shot_idx", $"keyframe_idx", $"dhash_hi",
        $"dhash_lo")
      .as[(Long, Int, Int, Long, Long)].collect()
    val bounds = q("mm_shot_boundaries")
      .select($"media_id", $"frame_idx").as[(Long, Int)].collect().toSet
    // exactly the boundary frames, one keyframe per boundary
    assert(kf.map(r => (r._1, r._3)).toSet == bounds)
    assert(kf.length == bounds.size)
    // shot numbering is dense 1..k per video, ordered by frame
    kf.groupBy(_._1).foreach { case (vid, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._2).toSeq == (1 to rows.length), s"video $vid")
      // fixture: shots start every 2 frames, so keyframes are even
      sorted.foreach(r => assert(r._3 % 2 == 0, s"video $vid"))
    }
    // keyframes are even frames = UNDECORATED base renders of
    // fid = id + 131*(j/2); re-derive each hash through the codec
    kf.foreach { r =>
      val fid = r._1 + 131L * (r._3 / 2)
      val img = graft.operators.Multimodal.BmpCodec.decode(
        graft.operators.Multimodal.BmpCodec.encode(fid))
      val (hi, lo) = graft.operators.Multimodal.dhashOf(img)
      assert(hi == r._4 && lo == r._5, s"video ${r._1} frame ${r._3}")
    }
  }
}
