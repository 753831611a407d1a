package graft.sources.pcap

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.pcap.{DecodeOptions, PayloadDecoders}

/** `spark.read.format("pcap")` — DataSource V2 batch source for classic
  * libpcap capture files.
  *
  * Architecture (SURVEY.md §1.4/§2A): the reference exposes packets to SQL
  * through a Hadoop `InputFormat` + Hive SerDe pair
  * (hadoop-pcap-lib/.../io/PcapInputFormat.java,
  * hadoop-pcap-serde/.../PcapDeserializer.java); the Spark-native shape is
  * a DSv2 `TableProvider` whose `PartitionReader` runs the decoder core and
  * writes `InternalRow`s directly — no boxing boundary, with column
  * pruning pushed *into* the decoder (skip DNS parse / MD5 / payload
  * retention when unrequested), which the reference cannot do.
  *
  * Scale design:
  *   - pcap has no sync markers → never byte-range split
  *     (`isSplitable=false` in the reference, PcapInputFormat.java:66-75);
  *     parallelism unit is the whole file;
  *   - small files are bin-packed into partitions up to
  *     `spark.sql.files.maxPartitionBytes` (the reference's
  *     CombinePcapInputFormat + 100 MB split guidance,
  *     hadoop-pcap-serde/README.md:16-19), so a 100 TB landing directory
  *     of many captures still yields bounded, balanced tasks;
  *   - `.gz` (any Hadoop codec) transparently decompressed, matching
  *     PcapInputFormat.java:46-49.
  *
  * Options: `decoder` = `ip` (default) | `dns`; `md5` = `true` to compute
  * the frame digest (reference conf flag
  * net.ripe.hadoop.pcap.PcapReader.calculateMD5, PcapReader.java:19).
  */
class PcapDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pcap"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PcapSchema.full

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PcapTable(new CaseInsensitiveStringMap(properties))
}

class PcapTable(options: CaseInsensitiveStringMap) extends Table
  with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"pcap(${PcapTable.paths(options).mkString(",")})"
  override def schema(): StructType = PcapSchema.full
  // ACCEPT_ANY_SCHEMA: writes carry only (ts_micro, frame) plus whatever
  // else the user selected — the write builder validates the two required
  // columns instead of forcing the full 34-column table schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo):
      org.apache.spark.sql.connector.write.WriteBuilder = {
    val merged = new util.HashMap[String, String]()
    merged.putAll(options)
    merged.putAll(info.options())
    new PcapWriteBuilder(new CaseInsensitiveStringMap(merged), info)
  }

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // `options` (table properties) carries the path; scan options carry
    // per-read settings. Merge, scan options winning.
    val merged = new util.HashMap[String, String]()
    merged.putAll(options)
    merged.putAll(caseInsensitiveOptions)
    new PcapScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

object PcapTable {
  def paths(options: CaseInsensitiveStringMap): Seq[String] =
    graft.sources.PathOptions.paths(options, "pcap")

  /** ONE definition of which directory entries are capture data — the
    * batch and streaming listings must agree or a file class admitted
    * by only one of them crashes the other's reader ("_"/"." prefixes
    * are the Hadoop/Spark hidden-file conventions; `.tsidx` sidecars
    * are this source's own stats files). */
  def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".") &&
      !PcapTsIndex.isSidecar(name)

  /** ONE file-listing implementation shared by the scan and the
    * aggregate-pushdown probe in the builder (they must agree on the
    * file set or a pushed count could cover different files than a
    * scan would read). */
  def listDataFiles(options: CaseInsensitiveStringMap,
      conf: Configuration): Seq[FileStatus] = {
    graft.sources.ListingStats.listings.increment()
    val declared = paths(options)
    if (declared.isEmpty)
      throw new IllegalArgumentException("pcap source requires a path")
    declared.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse {
        if (fs.exists(path)) Seq(fs.getFileStatus(path)) else Seq.empty
      }
      if (matches.isEmpty)
        throw new java.io.FileNotFoundException(s"pcap path does not exist: $p")
      matches.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(_.isFile)
            .filter(s => isDataFile(s.getPath.getName))
        else Seq(st)
      }.filterNot(st => PcapTsIndex.isSidecar(st.getPath.getName))
    }
  }
}

class PcapScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var required: StructType = PcapSchema.full
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  /** Pushed stat columns in aggregate order: 'c' = COUNT(*),
    * 'n' = MIN(ts), 'x' = MAX(ts). */
  private var statCols: Seq[Char] = Nil
  private var statValues: Option[(Long, Long, Option[Long])] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept simple comparisons the decoder can evaluate per packet; all
    * filters are also returned as residual so Spark re-checks them —
    * the pushdown is a row-skipping optimization, never a semantic
    * contract (SURVEY.md §4 roadmap item). */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter]):
      Array[org.apache.spark.sql.sources.Filter] = {
    // option("pushdown","false") disables the row-skip for A/B measurement
    // (semantics are unchanged either way: all filters stay residual)
    pushed =
      if (options.getBoolean("pushdown", true))
        filters.filter(PcapPacketFilter.supported)
      else Array.empty
    filters // everything stays post-scan too
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  // ----- metadata-only COUNT(*) / MIN(ts) / MAX(ts) (rounds 9, 11) -------
  // The capture-triage trio — how many packets landed, and what time
  // range do they span — never opens a file when every capture has a
  // `.tsidx` sidecar: COUNT(*) sums the sidecar counts, MIN/MAX(ts)
  // fold the sidecar second-bounds (the sidecar records whole-second
  // ts, exactly the `ts` column's unit), all answered from the listing
  // alone — O(files), not O(bytes). Catalyst only offers the aggregate
  // when no filter sits between the Aggregate and the scan (our pushed
  // filters are always residual, so ANY filter blocks the offer — a
  // filtered count/range still decodes), and any file lacking the
  // needed sidecar field declines the pushdown and falls back to the
  // full scan. `option("countPushdown","false")` disables.

  /** Classify a pushable stats aggregation into per-column tags
    * ('c' COUNT(*), 'n' MIN(ts), 'x' MAX(ts)); None if anything else
    * appears or there is a GROUP BY. */
  private def statsSpec(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Seq[Char]] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    def tsRef(e: org.apache.spark.sql.connector.expressions.Expression)
        : Boolean = e match {
      case nr: NamedReference => nr.fieldNames.toSeq == Seq("ts")
      case _ => false
    }
    if (agg.groupByExpressions.nonEmpty || agg.aggregateExpressions.isEmpty)
      return None
    val tags = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => 'c'
      case m: Min if tsRef(m.column) => 'n'
      case m: Max if tsRef(m.column) => 'x'
      case _ => return None
    }
    Some(tags)
  }

  /** Fold (min ts, max ts, Σ count) over the exact file set the scan
    * would read; None if the set is empty (MIN/MAX would be NULL —
    * let the scan path answer that) or ANY file lacks a sidecar; the
    * count is None if any sidecar is count-less (pre-round-9 format). */
  // ONE listing per scan BUILD, shared with the scan this builder
  // produces (the aggregate probe and the scan's stats/planning all
  // need the same capture set)
  private lazy val listedFilesMemo: Seq[FileStatus] =
    PcapTable.listDataFiles(options,
      SparkSession.active.sessionState.newHadoopConf())

  private def sidecarStats(): Option[(Long, Long, Option[Long])] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val files = listedFilesMemo
    if (files.isEmpty) return None
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var total: Option[Long] = Some(0L)
    files.foreach { st =>
      PcapTsIndex.readSidecarStats(
          st.getPath.getFileSystem(conf), st.getPath) match {
        case Some((lo, hi, n)) =>
          mn = math.min(mn, lo)
          mx = math.max(mx, hi)
          total = for (t <- total; c <- n) yield t + c
        case None => return None
      }
    }
    Some((mn, mx, total))
  }

  // Memoized: the planner probes supportCompletePushDown AND
  // pushAggregation, and each sidecarStats() is a driver-side directory
  // listing plus one sidecar read per capture — pay it once per builder.
  private lazy val sidecarStatsMemo: Option[(Long, Long, Option[Long])] =
    sidecarStats()

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = pushAggregation(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    if (!options.getBoolean("countPushdown", true)) return false
    if (pushed.nonEmpty) return false
    statsSpec(agg) match {
      case Some(tags) =>
        statValues = sidecarStatsMemo
        // a COUNT(*) column needs counted sidecars; min/max only bounds
        if (tags.contains('c') && statValues.exists(_._3.isEmpty))
          statValues = None
        statCols = tags
        statValues.isDefined
      case None => false
    }
  }

  override def build(): Scan = statValues match {
    case Some((mn, mx, total)) if statCols.nonEmpty =>
      new PcapStatsScan(statCols.map {
        case 'c' => total.get
        case 'n' => mn
        case 'x' => mx
      })
    case _ => new PcapScan(required, options, pushed,
      () => listedFilesMemo)
  }
}

/** The metadata-only stats scan: one partition, one row, the pushed
  * COUNT(*)/MIN(ts)/MAX(ts) values in aggregate order — no capture
  * file is ever opened. */
class PcapStatsScan(values: Seq[Long]) extends Scan with Batch {
  override def readSchema(): StructType = {
    var st = new StructType()
    values.indices.foreach(i => st = st.add(s"stat_$i",
      org.apache.spark.sql.types.LongType, false))
    st
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"PcapStatsScan(values=[${values.mkString(",")}], fromSidecars=true)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(PcapStatsPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new PcapStatsReaderFactory
}

case class PcapStatsPartition(values: Seq[Long]) extends InputPartition

class PcapStatsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition):
      org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[PcapStatsPartition]
    new org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] {
      private var emitted = false
      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }
      override def get(): org.apache.spark.sql.catalyst.InternalRow =
        org.apache.spark.sql.catalyst.InternalRow.fromSeq(p.values)
      override def close(): Unit = ()
    }
  }
}

class PcapScan(requiredSchema: StructType, options: CaseInsensitiveStringMap,
    pushedFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    listed: () => Seq[FileStatus] = null)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this

  /** Catalyst-visible size: summed capture bytes AFTER ts pruning, so
    * a ts-bounded scan of a small window plans like the small relation
    * it is (static broadcast eligibility instead of
    * defaultSizeInBytes). */
  // ONE listing + ts-prune per scan: estimateStatistics and
  // planInputPartitions both need the file set, and a repeated
  // listing is O(files) RPCs per query on an object store
  private lazy val prunedFilesMemo: Seq[FileStatus] =
    pruneByTs(listFiles())

  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val bytes = prunedFilesMemo.map(_.getLen).sum
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }

  // task-level decode metrics in the Spark UI / listener bus — the DSv2
  // mapping of the reference's getPos/getProgress reporting
  // (PcapRecordReader.java:66-76, SURVEY.md §2A op 6)
  override def supportedCustomMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new PcapPacketsMetric, new PcapBytesMetric)

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new PcapMicroBatchStream(options, requiredSchema, hadoopConf)
  override def description(): String =
    s"PcapScan(columns=[${requiredSchema.fieldNames.mkString(",")}], " +
      s"pushedFilters=[${pushedFilters.mkString(",")}])"

  private def sparkSession = SparkSession.active

  private def hadoopConf: Configuration =
    sparkSession.sessionState.newHadoopConf()

  private def listFiles(): Seq[FileStatus] =
    if (listed != null) listed()
    else PcapTable.listDataFiles(options, hadoopConf)

  /** Drop files whose per-file ts stats cannot intersect the pushed ts
    * bounds (SURVEY.md §4 file-level skipping). Stats come from exact
    * `.tsidx` sidecars, or — only under `assumeMonotonicTs` — a cheap
    * first/last-record probe; files without stats always survive, and
    * the pushed filters stay residual, so semantics are unchanged. */
  private def pruneByTs(files: Seq[FileStatus]): Seq[FileStatus] =
    PcapTsIndex.tsBounds(pushedFilters) match {
      case Some((lo, hi)) if options.getBoolean("tsPruning", true) =>
        val conf = hadoopConf
        val assumeMono = options.getBoolean("assumeMonotonicTs", false)
        val kept = files.filter { st =>
          val stats = PcapTsIndex
            .readSidecar(st.getPath.getFileSystem(conf), st.getPath)
            .orElse(if (assumeMono) PcapTsIndex.firstLastTs(conf, st)
                    else None)
          stats.forall { case (mn, mx) => mx >= lo && mn <= hi }
        }
        val dropped = files.length - kept.length
        if (dropped > 0) {
          PcapTsIndex.prunedFiles.add(dropped.toLong)
          org.slf4j.LoggerFactory.getLogger(classOf[PcapScan]).info(
            s"pcap ts pruning: skipped $dropped of ${files.length} " +
              s"files for ts in [$lo, $hi]")
        }
        kept
      case _ => files
    }

  /** Whole-file partitions, bin-packed to maxPartitionBytes
    * (best-fit decreasing via [[graft.sources.BinPack]] — O(n log n)
    * planning, million-file-lake safe). A file larger than the target
    * gets its own partition — pcap is not byte-range splittable. */
  override def planInputPartitions(): Array[InputPartition] = {
    // source option override, e.g. .option("maxBytesPerPartition", "16m"),
    // for decode-bound workloads where smaller tasks beat fewer tasks
    val openCost = sparkSession.sessionState.conf.filesOpenCostInBytes
    val files = prunedFilesMemo.map(f => f.getPath.toString -> f.getLen)
    val maxBytes = Option(options.get("maxBytesPerPartition"))
      .map(v => org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v))
      .getOrElse(graft.sources.BinPack.adaptiveTarget(
        sparkSession.sessionState.conf.filesMaxPartitionBytes, openCost,
        files.map(_._2).sum,
        sparkSession.sparkContext.defaultParallelism))
    graft.sources.BinPack.pack(files, maxBytes, openCost)
      .map(b => PcapInputPartition(b): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val appDecoder = PayloadDecoders.forName(
      options.getOrDefault("decoder", "ip"))
    val wantsDnsCols = requiredSchema.fieldNames.exists(_.startsWith("dns_"))
    val sectionCols = Set("dns_answer", "dns_authority", "dns_additional")
    val need = requiredSchema.fieldNames.toSet
    val decode = DecodeOptions(
      appDecoder = if (wantsDnsCols) appDecoder else None,
      md5 = options.getBoolean("md5", false) && need("md5"),
      keepPayload = need("payload"),
      // prune RR-section string building when none of the section
      // columns is requested (qname/qtype telemetry projections)
      dnsSections = requiredSchema.fieldNames.exists(sectionCols),
      // columns referenced by residual filters are always part of the
      // required schema, so schema-driven pruning can never starve a
      // pushed predicate (PrunedDecodeParitySpec)
      udpsum = need("udpsum"),
      addrStrings = need("src") || need("dst"),
      extHeaderStrings = need("ext_headers"),
      keepFrame = need("frame"),
      tcpOptions = need("tcp_mss") || need("tcp_wscale") ||
        need("tcp_sack_ok") || need("tcp_ts_ok"))
    new PcapReaderFactory(new SerializableHadoopConf(hadoopConf),
      requiredSchema, decode, PcapPacketFilter.compile(pushedFilters),
      // batch (not streaming) reads emit ColumnarBatches for flat
      // projections; option("columnar","false") forces the row path
      // for A/B measurement
      columnar = options.getBoolean("columnar", true),
      batchSize = options.getInt("columnarBatchSize", 4096))
  }
}

/** Files of one task. Serialized to executors; paths only. */
case class PcapInputPartition(files: Seq[String]) extends InputPartition

class PcapReaderFactory(conf: SerializableHadoopConf, schema: StructType,
    decode: DecodeOptions,
    filter: PcapPacketFilter.Predicate = PcapPacketFilter.acceptAll,
    columnar: Boolean = false,
    batchSize: Int = 4096)
  extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar && PcapSchema.columnarEligible(schema)

  override def createReader(partition: InputPartition): PartitionReader[
    org.apache.spark.sql.catalyst.InternalRow] =
    new PcapPartitionReader(
      partition.asInstanceOf[PcapInputPartition].files, conf.value, schema,
      decode, filter)

  override def createColumnarReader(partition: InputPartition):
      PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new PcapColumnarPartitionReader(
      partition.asInstanceOf[PcapInputPartition].files, conf.value, schema,
      decode, filter, batchSize)
}

class PcapPacketsMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "packetsDecoded"
  override def description(): String = "number of packets decoded"
}

class PcapBytesMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "bytesDecoded"
  override def description(): String = "pcap bytes decoded"
}

/** Minimal serializable Hadoop Configuration wrapper (the Spark-internal
  * one is `private[spark]`). */
class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Helper to open a (possibly codec-compressed) pcap file as a stream. */
object PcapFileOpener {
  def open(conf: Configuration, pathStr: String): java.io.InputStream = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    val raw = fs.open(path)
    val name = path.getName.toLowerCase(java.util.Locale.ROOT)
    val decoded =
      // .zst/.zstd captures (the compression modern rotating-capture
      // setups apply) go through zstd-jni's streaming decoder, which is
      // already on Spark's classpath; Hadoop's own ZStandardCodec needs
      // the native libhadoop build most clusters don't ship
      if (name.endsWith(".zst") || name.endsWith(".zstd"))
        new com.github.luben.zstd.ZstdInputStream(raw): java.io.InputStream
      else Option(new CompressionCodecFactory(conf).getCodec(path))
        .map(_.createInputStream(raw).asInstanceOf[java.io.InputStream])
        .getOrElse(raw: java.io.InputStream)
    // the decoder issues many small reads (16-byte packet headers);
    // unbuffered they each hit the (checksummed) Hadoop stream
    new java.io.BufferedInputStream(decoded, 1 << 20)
  }
}
