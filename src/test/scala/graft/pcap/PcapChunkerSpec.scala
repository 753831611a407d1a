package graft.pcap

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class PcapChunkerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("chunking a big capture preserves every packet and parallelizes") {
    val tmp = java.nio.file.Files.createTempDirectory("chunker")
    val big = tmp.resolve("big.pcap")
    PcapSynth.ensureFile(big, 2L << 20) // ~2 MB, ~20k packets

    val conf = new Configuration()
    val chunks = PcapChunker.chunk(conf, big.toString,
      tmp.resolve("chunks").toString, 256L << 10)
    assert(chunks.length >= 7) // ~2MB into 256KB chunks

    val orig = spark.read.format("pcap").load(big.toString)
    val chunked = spark.read.format("pcap")
      .option("maxBytesPerPartition", "256k")
      .load(tmp.resolve("chunks").toString)
    assert(chunked.count() == orig.count())
    assert(chunked.rdd.getNumPartitions > 1)

    // content-identical: same multiset of (ts_micro, size, dst_port)
    val a = orig.groupBy("ts_micro", "size", "dst_port").count()
    val b = chunked.groupBy("ts_micro", "size", "dst_port").count()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("flows split across chunk boundaries reassemble identically") {
    // the multi-TB-single-capture scale path: PcapChunker re-chunks for
    // parallelism, scattering each flow's segments across chunk FILES
    // (and so across pkt_idx restarts and partitions) — stream bytes
    // must not change. Also covers same-seq exact dups whose copies
    // land in different chunks.
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val segs = PcapSynth.tcpFlowSegments(40)
    val withDupes = segs.zipWithIndex.flatMap { case (s @ (ts, us, fr), i) =>
      if (i % 5 == 0) Seq(s, (ts + 1, us, fr.clone())) else Seq(s)
    }
    val whole = java.nio.file.Files.createTempFile("chunk_re", ".pcap")
    PcapSynth.writeAtomic(whole, PcapSynth.file(withDupes))
    val destDir = java.nio.file.Files.createTempDirectory("chunk_re_out")
    val conf = new org.apache.hadoop.conf.Configuration()
    val chunks = PcapChunker.chunk(conf, whole.toString, destDir.toString,
      chunkBytes = 2048) // tiny chunks -> many boundary crossings
    assert(chunks.length > 3, s"chunking must actually split (${chunks.length})")
    def streams(path: String) =
      spark.read.format("pcap").load(path)
        .filter($"protocol" === "TCP")
        .groupBy($"src", $"src_port")
        .agg(graft.functions.Reassemble.stream().as("r"))
        .select($"src", $"src_port", md5($"r.stream").as("h"),
          $"r.truncated")
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) ->
          ((r.getString(2), r.getBoolean(3))))
        .toMap
    val w = streams(whole.toString)
    val c = streams(destDir.toString)
    assert(w.size == 40 && c == w,
      "chunked reassembly differs from the single-capture reassembly")
  }

  test("chunking an empty capture yields no chunks") {
    val tmp = java.nio.file.Files.createTempDirectory("chunker2")
    val empty = tmp.resolve("empty.pcap")
    java.nio.file.Files.write(empty, PcapSynth.globalHeader())
    val chunks = PcapChunker.chunk(new Configuration(), empty.toString,
      tmp.resolve("out").toString, 1L << 20)
    // a single chunk containing only the global header (zero packets)
    assert(chunks.length == 1)
    assert(spark.read.format("pcap").load(chunks.head).count() == 0)
  }
}
