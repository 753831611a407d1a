package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ListingStats
import graft.sources.warc.WarcSynth

/** Pins "at most ONE data-file directory listing per scan build" for
  * all three container sources — a listing is O(files) RPCs on an
  * object store, and before memoization a single query paid it 3-4
  * times (stats estimate, aggregate probe, partition planning). */
class ListingCountSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def listingsDuring(body: => Unit): Long = {
    ListingStats.listings.reset()
    body
    ListingStats.listings.sum()
  }

  test("warc: one listing per scan build — full scan and metadata " +
      "COUNT(*) alike") {
    val dir = Files.createTempDirectory("warc_lst").toString
    WarcSynth.ensureFixture(dir, 30)
    val full = listingsDuring {
      spark.read.format("warc").load(dir).select("url").collect()
    }
    assert(full <= 1, s"full scan listed the directory $full times")
    // COUNT(*) involves TWO scan builds — the aggregate-pushdown probe
    // and Spark's computeStats path — each allowed one listing
    val counted = listingsDuring {
      spark.read.format("warc").load(dir).count()
    }
    assert(counted <= 2, s"COUNT(*) listed the directory $counted times")
  }

  test("pcap: one listing per scan build") {
    val dir = Files.createTempDirectory("pcap_lst")
    val pkts = graft.pcap.PcapSynth.icmpPackets(9)
    graft.pcap.PcapSynth.writeAtomic(dir.resolve("a.pcap"),
      graft.pcap.PcapSynth.file(pkts))
    val n = listingsDuring {
      spark.read.format("pcap").load(dir.toString)
        .select("ts", "protocol").collect()
    }
    assert(n <= 1, s"pcap scan listed the directory $n times")
  }

  test("wds: one listing per scan build") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wds_lst").toString
    spark.range(20).select(
        concat(lit("k"), $"id").as("key"),
        encode(concat(lit("body "), $"id"), "UTF-8").as("txt"))
      .coalesce(1)
      .write.format("wds").mode("append").save(dir)
    val n = listingsDuring {
      spark.read.format("wds").load(dir).select("key").collect()
    }
    assert(n <= 1, s"wds scan listed the directory $n times")
  }
}
