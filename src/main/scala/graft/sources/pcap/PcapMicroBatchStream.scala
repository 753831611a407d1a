package graft.sources.pcap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

import graft.pcap.DecodeOptions

/** Streaming extension of the pcap source: `readStream.format("pcap")`
  * over a landing directory of capture files (SURVEY.md §1.4 flags this
  * as the natural Structured Streaming extension — the reference is
  * strictly batch over closed files).
  *
  * File-discovery micro-batch model (the same contract as Spark's file
  * stream source): files are ordered by (modification time, path); an
  * offset is a count into that stable order; each micro-batch reads the
  * newly-landed whole files (pcap is never byte-range split). Files must
  * be immutable once landed — the standard landing-directory contract.
  *
  * Admission control: `maxFilesPerTrigger` bounds each micro-batch (the
  * same option and `ReadMaxFiles` limit Spark's own file source honors).
  * Without it a query started over a deep backlog — months of landed
  * captures — would plan the ENTIRE backlog as batch 0: unbounded task
  * count, no checkpoint until everything finishes. Bounded triggers give
  * steady incremental progress and commit-per-batch recovery.
  *
  * `Trigger.AvailableNow` composes with that: the backlog existing at
  * query start is snapshotted ([[prepareForTriggerAvailableNow]]),
  * drained in `maxFilesPerTrigger`-bounded batches, and the query then
  * STOPS — the scheduled batch-catchup pattern (run nightly, process
  * what landed, exit) with streaming-checkpoint semantics. Files landing
  * mid-drain wait for the next scheduled run.
  */
class PcapMicroBatchStream(
    options: org.apache.spark.sql.util.CaseInsensitiveStringMap,
    schema: StructType,
    conf: Configuration)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private case class FileEntry(path: String, mtime: Long, len: Long)

  /** stable discovery order: everything seen so far, sorted */
  @volatile private var discovered: Vector[FileEntry] = Vector.empty

  private def refresh(): Unit = {
    val found = PcapTable.paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      matches.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(_.isFile)
            .filterNot(_.getPath.getName.startsWith("_"))
            .filterNot(_.getPath.getName.startsWith("."))
        else Seq(st)
      }
    }.map(st => FileEntry(st.getPath.toString, st.getModificationTime, st.getLen))
    val known = discovered.map(_.path).toSet
    val fresh = found.filterNot(f => known.contains(f.path))
      .sortBy(f => (f.mtime, f.path))
    discovered = discovered ++ fresh
  }

  private val maxFilesPerTrigger: Option[Int] = {
    val v = options.getInt("maxFilesPerTrigger", -1)
    require(v == -1 || v > 0, s"maxFilesPerTrigger must be positive, got $v")
    if (v > 0) Some(v) else None
  }

  /** Trigger.AvailableNow end bound: the discovery count snapshotted at
    * query start. -1 = continuous mode (no bound). */
  @volatile private var availableNowEnd: Int = -1

  override def initialOffset(): Offset = PcapStreamOffset(0)

  override def prepareForTriggerAvailableNow(): Unit = {
    refresh()
    availableNowEnd = discovered.length
  }

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    if (availableNowEnd < 0) refresh() // AvailableNow reads its snapshot
    val avail = if (availableNowEnd < 0) discovered.length else availableNowEnd
    val s = start.asInstanceOf[PcapStreamOffset].count
    val end = limit match {
      case mf: ReadMaxFiles => math.min(avail, s + mf.maxFiles())
      case _                => avail
    }
    PcapStreamOffset(end)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset =
    PcapStreamOffset(json.trim.toInt)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PcapStreamOffset].count
    val e = end.asInstanceOf[PcapStreamOffset].count
    // one partition per newly-landed file (micro-batches are small by
    // construction; batch reads do the bin-packing)
    discovered.slice(s, e).map(f =>
      PcapInputPartition(Seq(f.path)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val appDecoder = graft.pcap.PayloadDecoders.forName(
      options.getOrDefault("decoder", "ip"))
    val need = schema.fieldNames.toSet
    val decode = DecodeOptions(
      appDecoder =
        if (schema.fieldNames.exists(_.startsWith("dns_"))) appDecoder
        else None,
      md5 = options.getBoolean("md5", false) && need("md5"),
      keepPayload = need("payload"),
      dnsSections = schema.fieldNames.exists(
        Set("dns_answer", "dns_authority", "dns_additional")),
      udpsum = need("udpsum"),
      addrStrings = need("src") || need("dst"),
      extHeaderStrings = need("ext_headers"),
      keepFrame = need("frame"))
    new PcapReaderFactory(new SerializableHadoopConf(conf), schema, decode)
  }

  override def stop(): Unit = ()
}

case class PcapStreamOffset(count: Int) extends Offset {
  override def json(): String = count.toString
}
