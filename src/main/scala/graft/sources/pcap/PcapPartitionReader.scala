package graft.sources.pcap

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.pcap.{DecodeOptions, PacketRecord, PcapStreamReader}

/** Reads the files of one [[PcapInputPartition]] sequentially, streaming
  * decoded packets as `InternalRow`s (the Spark analogue of
  * PcapRecordReader + CombinePcapRecordReader under
  * hadoop-pcap-lib/.../io/reader/). `pkt_idx` restarts at 1 per
  * file, matching the reference's per-split LongWritable key
  * (PcapRecordReader.java:43-54). */
class PcapPartitionReader(
    files: Seq[String],
    conf: Configuration,
    schema: StructType,
    decode: DecodeOptions,
    filter: PcapPacketFilter.Predicate = PcapPacketFilter.acceptAll)
  extends PartitionReader[InternalRow] {

  private val build = PcapSchema.rowBuilder(schema)
  private val fileIter = files.iterator
  private var stream: java.io.InputStream = _
  private var packets: Iterator[PacketRecord] = Iterator.empty
  private var currentFile: UTF8String = _
  private var pktIdx = 0L
  private var nPackets = 0L
  private var nBytes = 0L
  private var row: InternalRow = _

  private def advanceFile(): Boolean = {
    if (stream != null) { stream.close(); stream = null }
    if (!fileIter.hasNext) return false
    val path = fileIter.next()
    currentFile = UTF8String.fromString(path)
    stream = PcapFileOpener.open(conf, path)
    packets = graft.pcap.PacketReaders.open(stream, decode)
    pktIdx = 0L
    true
  }

  override def next(): Boolean = {
    while (true) {
      while (!packets.hasNext) {
        if (!advanceFile()) return false
      }
      val rec = packets.next()
      pktIdx += 1
      nPackets += 1
      nBytes += rec.size.getOrElse(0L) + 16L
      if (filter(rec)) {
        row = build(rec, pktIdx, currentFile)
        return true
      }
      // pushed-filter miss: skip row materialization entirely
    }
    false
  }

  override def get(): InternalRow = row

  override def currentMetricsValues():
      Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = {
    val pkts = nPackets
    val bytes = nBytes
    Array(
      new org.apache.spark.sql.connector.metric.CustomTaskMetric {
        override def name(): String = "packetsDecoded"
        override def value(): Long = pkts
      },
      new org.apache.spark.sql.connector.metric.CustomTaskMetric {
        override def name(): String = "bytesDecoded"
        override def value(): Long = bytes
      })
  }

  override def close(): Unit =
    if (stream != null) { stream.close(); stream = null }
}
