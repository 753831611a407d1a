package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-level parity helpers for the reference's scalar decode kernels
  * (SURVEY.md §2B "scalar functions": protocol-id→name
  * PcapReaderUtil.java:59-66, v6-ext-header-id→name :68-79, bytes→hex
  * :103-113). The decoder itself uses these maps internally; registering
  * them as UDFs lets SQL users translate raw numeric columns the same
  * way the reference's Java callers could. Plain Scala UDFs are fine
  * here: these run on tiny dimension-like columns, never in the decode
  * hot path. */
object ParityFunctions {
  def register(spark: SparkSession): Unit = {
    spark.udf.register("protocol_name",
      (id: Int) => graft.pcap.PcapStreamReader.protocolName(id))
    spark.udf.register("ipv6_ext_name",
      (id: Int) => graft.pcap.PcapStreamReader.ExtHeaderNames
        .getOrElse(id, id.toString))
    spark.udf.register("to_hex_upper",
      (b: Array[Byte]) => graft.pcap.PcapStreamReader.upperHex(b))
  }
}
