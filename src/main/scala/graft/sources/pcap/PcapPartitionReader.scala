package graft.sources.pcap

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.pcap.{DecodeOptions, PacketRecord}

/** Sequential decode of one [[PcapInputPartition]]'s files — the packet
  * feed both the row reader below and [[PcapColumnarPartitionReader]]
  * draw from (the Spark analogue of PcapRecordReader +
  * CombinePcapRecordReader under hadoop-pcap-lib/.../io/reader/).
  * `pktIdx` restarts at 1 per file, matching the reference's per-split
  * LongWritable key (PcapRecordReader.java:43-54). */
private[pcap] class PacketFeed(
    files: Seq[String], conf: Configuration, decode: DecodeOptions) {

  private val fileIter = files.iterator
  private var stream: java.io.InputStream = _
  private var packets: Iterator[PacketRecord] = Iterator.empty
  var currentFile: UTF8String = _
  var currentFileBytes: Array[Byte] = _
  var pktIdx = 0L
  var nPackets = 0L
  var nBytes = 0L

  private def advanceFile(): Boolean = {
    if (stream != null) { stream.close(); stream = null }
    if (!fileIter.hasNext) return false
    val path = fileIter.next()
    currentFileBytes = path.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    currentFile = UTF8String.fromBytes(currentFileBytes)
    stream = PcapFileOpener.open(conf, path)
    packets = graft.pcap.PacketReaders.open(stream, decode)
    pktIdx = 0L
    true
  }

  /** Next decoded record, or null when every file is exhausted. */
  def next(): PacketRecord = {
    while (!packets.hasNext) {
      if (!advanceFile()) return null
    }
    val rec = packets.next()
    pktIdx += 1
    nPackets += 1
    nBytes += rec.size.getOrElse(0L) + 16L
    rec
  }

  def metrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = {
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

  def close(): Unit =
    if (stream != null) { stream.close(); stream = null }
}

/** Row-at-a-time reader: streams decoded packets as `InternalRow`s.
  * Used when the projection includes nested columns (the DNS RR-section
  * arrays) or when `columnar` is disabled; flat projections go through
  * [[PcapColumnarPartitionReader]] instead. */
class PcapPartitionReader(
    files: Seq[String],
    conf: Configuration,
    schema: StructType,
    decode: DecodeOptions,
    filter: PcapPacketFilter.Predicate = PcapPacketFilter.acceptAll)
  extends PartitionReader[InternalRow] {

  private val build = PcapSchema.rowBuilder(schema)
  private val feed = new PacketFeed(files, conf, decode)
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      val rec = feed.next()
      if (rec == null) return false
      if (filter(rec)) {
        row = build(rec, feed.pktIdx, feed.currentFile)
        return true
      }
      // pushed-filter miss: skip row materialization entirely
    }
    false
  }

  override def get(): InternalRow = row

  override def currentMetricsValues():
      Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    feed.metrics()

  override def close(): Unit = feed.close()
}
