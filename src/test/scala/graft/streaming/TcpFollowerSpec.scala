package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming TCP follower must agree with the batch reassembly
  * aggregator byte-for-byte on in-order captures (the spec-match the
  * batch fold's doc comment promises), including at the truncation cap. */
class TcpFollowerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** flow key -> (stream bytes md5, length, truncated) via the batch
    * aggregator at `cap`. */
  private def batchStreams(path: String, cap: Long) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.format("pcap").load(path)
      .filter($"protocol" === "TCP")
      .groupBy($"src", $"dst", $"src_port", $"dst_port")
      .agg(graft.functions.Reassemble.stream(cap).as("r"))
      .select($"src", $"src_port", md5($"r.stream").as("h"),
        length($"r.stream").as("len"), $"r.truncated")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getInt(3), r.getBoolean(4))))
      .toMap
  }

  /** flow key -> (md5 of offset-ordered chunk concat, length, any chunk
    * truncated) from the follower's memory-sink output. */
  private def followedStreams(table: String) = {
    val rows = spark.table(table).collect()
      .map(r => ((r.getAs[String]("src"), r.getAs[Int]("src_port")),
        r.getAs[Long]("offset"), r.getAs[Array[Byte]]("chunk"),
        r.getAs[Boolean]("truncated")))
    rows.groupBy(_._1).map { case (k, chunks) =>
      val ordered = chunks.sortBy(_._2)
      // offsets must chain exactly: each chunk starts where the last ended
      ordered.foldLeft(0L) { case (expect, (_, off, bytes, _)) =>
        assert(off == expect, s"gap in $k: chunk at $off, expected $expect")
        off + bytes.length
      }
      val all = ordered.flatMap(_._3).toArray
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(all).map(b => f"${b & 0xFF}%02x").mkString
      k -> ((h, all.length, chunks.exists(_._4)))
    }
  }

  test("in-order capture: follower chunks == batch fold, across micro-batches") {
    val segs = graft.pcap.PcapSynth.tcpFlowSegments(30)
    val dir = Files.createTempDirectory("tcp_follow")
    val (half1, half2) = segs.splitAt(segs.length / 2)

    val chunks = TcpStreamFollower.follow(
      spark.readStream.format("pcap").load(dir.toString))
    val query = chunks.writeStream.format("memory")
      .queryName("tcp_chunks").outputMode("append").start()
    try {
      // two landings -> flows straddle micro-batches; the follower's
      // scalar state must chain offsets across them
      graft.pcap.PcapSynth.writeAtomic(dir.resolve("a.pcap"), graft.pcap.PcapSynth.file(half1))
      query.processAllAvailable()
      graft.pcap.PcapSynth.writeAtomic(dir.resolve("b.pcap"), graft.pcap.PcapSynth.file(half2))
      query.processAllAvailable()
    } finally query.stop()

    val got = followedStreams("tcp_chunks")
    val want = batchStreams(dir.toString,
      graft.functions.Reassemble.DefaultMaxStreamBytes)
    assert(got.size == 30 && want.size == 30)
    got.foreach { case (k, v) =>
      assert(v == want(k), s"flow $k: follower $v != batch ${want(k)}")
    }
    assert(got.values.forall(!_._3), "nothing may truncate under the default cap")
  }

  test("cap parity: follower truncates at the same segment boundary as batch") {
    // one 20-segment x 500 B flow against a 4 kB cap: both paths must
    // keep exactly 8 whole segments and flag truncation
    val segs = (0 until 20).map { k =>
      val payload = Array.tabulate[Byte](500)(j => ((k * 31 + j) % 127).toByte)
      (1700L + k, k.toLong, graft.pcap.PcapSynth.ipv4TcpFrame(
        src = Array[Byte](10, 50, 0, 1), dst = Array[Byte](10, 51, 0, 1),
        srcPort = 42000, dstPort = 80, ttl = 64, payload = payload,
        seq = 100L + k * 500L, flags = 0x18))
    }
    val dir = Files.createTempDirectory("tcp_follow_cap")
    val query = TcpStreamFollower.follow(
        spark.readStream.format("pcap").load(dir.toString),
        maxStreamBytes = 4096)
      .writeStream.format("memory")
      .queryName("tcp_chunks_cap").outputMode("append").start()
    try {
      graft.pcap.PcapSynth.writeAtomic(dir.resolve("a.pcap"),
        graft.pcap.PcapSynth.file(segs.take(5)))
      query.processAllAvailable()
      graft.pcap.PcapSynth.writeAtomic(dir.resolve("b.pcap"),
        graft.pcap.PcapSynth.file(segs.drop(5)))
      query.processAllAvailable()
    } finally query.stop()

    val got = followedStreams("tcp_chunks_cap")
    val want = batchStreams(dir.toString, 4096)
    assert(got.size == 1 && want.size == 1)
    val k = ("10.50.0.1", 42000)
    assert(got(k) == want(k), s"follower ${got(k)} != batch ${want(k)}")
    assert(got(k)._2 == 4000 && got(k)._3, "8 whole segments + truncated flag")
  }

  test("overlapping retransmits: follower trims covered prefixes like batch") {
    // the overlap fixture's corrupted retransmits (partial + fully
    // covered) must contribute nothing but the clean extension tail;
    // chunk offsets still chain exactly and every flow's bytes equal the
    // clean generator payload (and the batch aggregator's)
    val dir = Files.createTempDirectory("tcp_follow_ovl")
    val query = TcpStreamFollower.follow(
        spark.readStream.format("pcap").load(dir.toString))
      .writeStream.format("memory")
      .queryName("tcp_chunks_ovl").outputMode("append").start()
    try {
      graft.pcap.PcapSynth.writeAtomic(dir.resolve("a.pcap"),
        graft.pcap.PcapSynth.file(graft.pcap.PcapSynth.tcpOverlapSegments(16)))
      query.processAllAvailable()
    } finally query.stop()
    val got = followedStreams("tcp_chunks_ovl")
    val want = batchStreams(dir.toString,
      graft.functions.Reassemble.DefaultMaxStreamBytes)
    assert(got.size == 16 && want.size == 16)
    got.foreach { case (k, v) =>
      assert(v == want(k), s"flow $k: follower $v != batch ${want(k)}")
    }
    // and both equal the clean payload md5 from the generator spec
    (0 until 16).foreach { f =>
      val clean = graft.pcap.PcapSynth.tcpFlowPayload(f)
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(clean).map(b => f"${b & 0xFF}%02x").mkString
      assert(got((s"10.7.0.$f", 31000 + f)) == ((h, clean.length, false)))
    }
  }

  test("randomized soup, in-order arrival: follower == batch at a truncating cap") {
    // random overlap/dup/gap geometry (the ReassemblyCapSpec soup),
    // arrival in seq order (the follower's contract) but cut into
    // random micro-batch landings, at a cap small enough that flows
    // truncate mid-stream — follower chunks must reassemble to exactly
    // the batch aggregator's bytes and flag
    val rnd = new scala.util.Random(53)
    val flowSegs = (0 until 8).map { f =>
      var seqCursor = 0L
      val segs = (0 until 30).map { _ =>
        val seqPick = rnd.nextInt(4) match {
          case 0 => seqCursor
          case 1 => seqCursor + rnd.nextInt(10)
          case 2 => math.max(0, seqCursor - rnd.nextInt(20))
          case _ => math.max(0, seqCursor - rnd.nextInt(30))
        }
        // length AND bytes are pure functions of (flow, seq), so any
        // same-seq collision is an EXACT retransmit (the documented tie
        // contract — real TCP has one true byte per stream position;
        // batch tie-breaks by per-file pkt_idx, the follower by arrival,
        // and only content-identical ties make those interchangeable)
        val len = 1 + ((f * 13 + seqPick * 7) % 30).toInt
        val pay = Array.tabulate[Byte](len)(j =>
          ((f * 37 + (seqPick + j) * 11) % 110).toByte)
        seqCursor = math.max(seqCursor, seqPick + len)
        (seqPick, pay)
      }
      // follower contract: arrival in (seq) order; ties keep gen order
      f -> segs.sortBy(_._1)
    }
    // interleave flows round-robin, preserving per-flow order, with
    // global capture positions as pkt_idx
    val maxLen = flowSegs.map(_._2.length).max
    val ordered = for {
      k <- 0 until maxLen
      (f, segs) <- flowSegs if k < segs.length
    } yield (f, segs(k))
    val frames = ordered.zipWithIndex.map { case ((f, (seq, pay)), i) =>
      (1900L + i / 40, (i % 40) * 1499L, graft.pcap.PcapSynth.ipv4TcpFrame(
        src = Array[Byte](10, 79, 0, f.toByte),
        dst = Array[Byte](10, 80, 0, 1),
        srcPort = 45000 + f, dstPort = 80, ttl = 64,
        payload = pay, seq = seq, flags = 0x18))
    }
    val dir = Files.createTempDirectory("tcp_follow_soup")
    val query = TcpStreamFollower.follow(
        spark.readStream.format("pcap").load(dir.toString),
        maxStreamBytes = 256)
      .writeStream.format("memory")
      .queryName("tcp_chunks_soup").outputMode("append").start()
    try {
      // random landing cuts -> flows straddle micro-batches arbitrarily
      var rest = frames
      var part = 0
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(80)
        graft.pcap.PcapSynth.writeAtomic(dir.resolve(f"l$part%03d.pcap"),
          graft.pcap.PcapSynth.file(rest.take(take)))
        query.processAllAvailable()
        rest = rest.drop(take)
        part += 1
      }
    } finally query.stop()
    val got = followedStreams("tcp_chunks_soup")
    val want = batchStreams(dir.toString, 256)
    assert(want.size == 8 && want.values.exists(_._3),
      "soup must truncate at least one flow for the test to bite")
    got.foreach { case (k, v) =>
      assert(v == want(k), s"flow $k: follower $v != batch ${want(k)}")
    }
    assert(got.size == want.size)
  }

  test("exact retransmits are dropped, not re-emitted") {
    val base = (0 until 4).map { k =>
      val payload = s"seg$k-payload".getBytes("US-ASCII")
      (1700L + k, k.toLong, graft.pcap.PcapSynth.ipv4TcpFrame(
        src = Array[Byte](10, 52, 0, 1), dst = Array[Byte](10, 51, 0, 1),
        srcPort = 43000, dstPort = 80, ttl = 64, payload = payload,
        seq = 100L + k * 12L, flags = 0x18))
    }
    val dir = Files.createTempDirectory("tcp_follow_dup")
    val query = TcpStreamFollower.follow(
        spark.readStream.format("pcap").load(dir.toString))
      .writeStream.format("memory")
      .queryName("tcp_chunks_dup").outputMode("append").start()
    try {
      graft.pcap.PcapSynth.writeAtomic(dir.resolve("a.pcap"), graft.pcap.PcapSynth.file(base))
      query.processAllAvailable()
      // the whole flow retransmits in a later batch: nothing new
      graft.pcap.PcapSynth.writeAtomic(dir.resolve("b.pcap"), graft.pcap.PcapSynth.file(
        base.map { case (ts, us, fr) => (ts + 60, us, fr.clone()) }))
      query.processAllAvailable()
    } finally query.stop()
    val got = followedStreams("tcp_chunks_dup")
    val k = ("10.52.0.1", 43000)
    assert(got(k)._2 == "seg0-payloadseg1-payloadseg2-payloadseg3-payload".length)
    assert(!got(k)._3)
  }
}
