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
