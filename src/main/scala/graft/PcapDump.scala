package graft

import org.apache.spark.sql.SparkSession

/** CLI debug dump — the working Spark equivalent of the reference's
  * PcapReaderRunner (run/PcapReaderRunner.java:30-50; note the reference
  * CLI is broken by constructor drift, PcapReaderRunner.java:56 — we do
  * not reproduce that, SURVEY.md §7.5).
  *
  * Usage: runMain graft.PcapDump <path> [ip|dns] [limit]
  */
object PcapDump {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(
      sys.error("usage: PcapDump <path> [ip|dns] [limit]"))
    val decoder = if (args.length > 1) args(1) else "dns"
    val limit = if (args.length > 2) args(2).toInt else 20
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.format("pcap")
      .option("decoder", decoder).option("md5", "true")
      .load(path)
    df.show(limit, truncate = 60, vertical = true)
    println(s"total packets: ${df.count()}")
    spark.stop()
  }
}
