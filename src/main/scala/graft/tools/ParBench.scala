package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: parallel decode throughput breakdown at local[32]. */
object ParBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_pcap_bench32"
    val mb = 256.0
    def t(label: String)(f: => Unit): Unit = {
      f // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: best ${times.min}%.2f s = ${mb / times.min}%.0f MB/s  (${times.map(x => f"$x%.2f").mkString(",")})")
    }
    def rd(dec: String) = spark.read.format("pcap").option("decoder", dec)
      .option("maxBytesPerPartition", "8m").load(dir)
    t("groupBy qtype (2 cols) ")(rd("dns")
      .filter("dns_qname is not null").groupBy("dns_qtype_str").count().collect())
    t("qname count (1 col)    ")(rd("dns").selectExpr("count(dns_qname)").collect())
    t("qtype_str only (1 col) ")(rd("dns").groupBy("dns_qtype_str").count().collect())
    t("count only, decoder=dns")(rd("dns").count())
    // string-predicate pushdown A/B: identical query, wide projection
    // (RR arrays + payload make materialization expensive); with the
    // suffix pushed only ~1.5% of packets build rows
    def wide(push: Boolean) = spark.read.format("pcap")
      .option("decoder", "dns").option("maxBytesPerPartition", "8m")
      .option("pushdown", push.toString).load(dir)
      .filter("dns_qname like '%.example7.com.'")
      .selectExpr("dns_qname", "src", "dst", "dns_answer", "payload")
      .write.format("noop").mode("overwrite").save()
    t("qname suffix: pushdown  ")(wide(push = true))
    t("qname suffix: residual  ")(wide(push = false))
    spark.stop()
  }
}
