package graft.sources.wds

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Multimodal.TarCodec
import graft.sources.pcap.SerializableHadoopConf

/** WebDataset-style tar-shard source + sink (`format("wds")`) — the
  * layout multimodal training actually reads: samples packed as
  * consecutive tar entries sharing a key stem ("<key>.jpg" +
  * "<key>.txt" + ...), one `.tar` per shard, sequential-read friendly.
  *
  * WRITE: the DataFrame must carry a `key` STRING column; EVERY other
  * column must be BINARY, and each non-null binary cell becomes the
  * entry `<key>.<columnName>`. One shard per task
  * (`shard-<partition>-<task>.tar`), streamed row-by-row through
  * [[TarCodec.writeEntry]] (constant memory per task — shard size is
  * controlled by the usual repartition before the write, exactly how
  * WebDataset exports distribute). Task output commits by atomic
  * rename from an `.inprogress` name; aborts delete it — no partial
  * shard becomes visible.
  *
  * READ: one row per tar entry — (shard STRING, key STRING, ext
  * STRING, data BINARY) — with sample regrouping left to the query
  * (`groupBy(key)` or a pivot), because WebDataset extension sets vary
  * per lake and a fixed wide schema would lie. Shards are whole-file
  * partitions (the pcap discipline: a tar has no splittable framing),
  * entries stream through the checksum-verifying [[TarCodec.decode]].
  * Column pruning is honored (a key/ext listing never materializes
  * entry bytes in the row, though the tar walk must still traverse
  * them — tar carries no central directory).
  */
class WdsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "wds"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WdsTable.ReadSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WdsTable(new CaseInsensitiveStringMap(properties))
}

object WdsTable {
  val ReadSchema: StructType = new StructType()
    .add("shard", StringType, nullable = false)
    .add("key", StringType, nullable = false)
    .add("ext", StringType, nullable = false)
    .add("data", BinaryType, nullable = false)

  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { json =>
      json.trim.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
        .filter(_.nonEmpty)
    }.getOrElse(Seq.empty)
    val single = Option(options.get("path")).toSeq
    (multi ++ single).distinct
  }

  def listDataFiles(options: CaseInsensitiveStringMap,
      conf: Configuration): Seq[FileStatus] = {
    val declared = paths(options)
    if (declared.isEmpty)
      throw new IllegalArgumentException("wds source requires a path")
    declared.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse {
        if (fs.exists(path)) Seq(fs.getFileStatus(path)) else Seq.empty
      }
      if (matches.isEmpty)
        throw new java.io.FileNotFoundException(
          s"wds path does not exist: $p")
      matches.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(_.isFile)
            .filter(s => !s.getPath.getName.startsWith("_") &&
              !s.getPath.getName.startsWith("."))
        else Seq(st)
      }
    }
  }
}

class WdsTable(options: CaseInsensitiveStringMap) extends Table
  with SupportsRead with SupportsWrite {

  override def name(): String =
    s"wds(${WdsTable.paths(options).mkString(",")})"
  override def schema(): StructType = WdsTable.ReadSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val merged = new util.HashMap[String, String]()
    merged.putAll(options)
    merged.putAll(scanOptions)
    new WdsScanBuilder(new CaseInsensitiveStringMap(merged))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = new util.HashMap[String, String]()
    merged.putAll(options)
    merged.putAll(info.options())
    new WdsWriteBuilder(new CaseInsensitiveStringMap(merged), info)
  }
}

// --------------------------------------------------------------- read side

class WdsScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = WdsTable.ReadSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new WdsScan(required, options)
}

class WdsScan(requiredSchema: StructType,
    options: CaseInsensitiveStringMap) extends Scan with Batch {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"WdsScan(columns=[${requiredSchema.fieldNames.mkString(",")}])"

  private def hadoopConf: Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  /** Whole-shard partitions: tar has no splittable framing (no central
    * directory, sizes only in per-entry headers), so like pcap the
    * parallel unit is the file — WebDataset lakes are MANY shards by
    * construction, so tasks stay plentiful and balanced. */
  override def planInputPartitions(): Array[InputPartition] =
    WdsTable.listDataFiles(options, hadoopConf)
      .map(st => WdsInputPartition(st.getPath.toString,
        st.getLen): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new WdsReaderFactory(new SerializableHadoopConf(hadoopConf),
      requiredSchema,
      options.getLong("maxShardBytes", 1L << 30))
}

case class WdsInputPartition(file: String, len: Long)
  extends InputPartition

class WdsReaderFactory(conf: SerializableHadoopConf, schema: StructType,
    maxShardBytes: Long) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WdsInputPartition]
    new PartitionReader[InternalRow] {
      private var it: Iterator[(String, Array[Byte])] = _
      private var cur: (String, Array[Byte]) = _
      private val shardName =
        new Path(p.file).getName

      private def ensureOpen(): Unit = if (it == null) {
        require(p.len <= maxShardBytes,
          s"shard ${p.file} is ${p.len} B > maxShardBytes $maxShardBytes" +
            " (raise the option for jumbo shards)")
        val path = new Path(p.file)
        val fs = path.getFileSystem(conf.value)
        val in = fs.open(path)
        val bytes = try {
          val buf = new Array[Byte](p.len.toInt)
          in.readFully(0, buf)
          buf
        } finally in.close()
        it = TarCodec.decode(bytes).iterator
      }

      override def next(): Boolean = {
        ensureOpen()
        if (it.hasNext) { cur = it.next(); true } else false
      }

      override def get(): InternalRow = {
        val dot = cur._1.lastIndexOf('.')
        val (key, ext) =
          if (dot <= 0) (cur._1, "")
          else (cur._1.substring(0, dot), cur._1.substring(dot + 1))
        InternalRow.fromSeq(schema.fieldNames.toSeq.map {
          case "shard" => UTF8String.fromString(shardName)
          case "key" => UTF8String.fromString(key)
          case "ext" => UTF8String.fromString(ext)
          case "data" => cur._2
        })
      }

      override def close(): Unit = ()
    }
  }
}

// -------------------------------------------------------------- write side

class WdsWriteBuilder(options: CaseInsensitiveStringMap,
    info: LogicalWriteInfo) extends WriteBuilder
  with SupportsTruncate {

  private var truncateFirst = false

  // mode("overwrite") arrives as truncate(): pre-existing shards that
  // are NOT part of this write are deleted at BATCH COMMIT time (after
  // every task committed its own shard), so readers never see a
  // half-replaced directory and an aborted job leaves the old data
  // intact — the closest rename-based analogue of a transactional
  // truncate-then-append
  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val schema = info.schema()
      val keyIdx = schema.fieldNames.indexOf("key")
      if (keyIdx < 0 || schema.fields(keyIdx).dataType != StringType)
        throw new IllegalArgumentException(
          "wds write requires a key STRING column; got " +
            schema.simpleString)
      val binCols = schema.fields.zipWithIndex.filter(_._2 != keyIdx)
      binCols.foreach { case (f, _) =>
        if (f.dataType != BinaryType)
          throw new IllegalArgumentException(
            s"wds write: column ${f.name} must be BINARY (it becomes " +
              s"the <key>.${f.name} entry); got ${f.dataType.simpleString}")
      }
      val dir = WdsTable.paths(options) match {
        case Seq(one) => one
        case other => throw new IllegalArgumentException(
          s"wds write requires exactly one output path; got $other")
      }
      new WdsBatchWrite(dir, keyIdx,
        binCols.map { case (f, i) => (f.name, i) }, truncateFirst)
    }
  }
}

class WdsBatchWrite(dir: String, keyIdx: Int,
    binCols: Seq[(String, Int)], truncateFirst: Boolean)
  extends BatchWrite {

  private val conf = new SerializableHadoopConf(
    SparkSession.active.sessionState.newHadoopConf())

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new WdsDataWriterFactory(dir, keyIdx, binCols, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    if (truncateFirst) {
      // overwrite semantics: once every task's shard is committed,
      // drop the survivors of previous writes (files not in THIS
      // write's commit messages)
      val mine = messages.collect {
        case WdsWriteCommitted(p, _) => new Path(p).getName
      }.toSet
      val dp = new Path(dir)
      val fs = dp.getFileSystem(conf.value)
      if (fs.exists(dp))
        fs.listStatus(dp).foreach { st =>
          val n = st.getPath.getName
          if (st.isFile && !n.startsWith(".") && !mine.contains(n))
            fs.delete(st.getPath, false)
        }
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class WdsDataWriterFactory(dir: String, keyIdx: Int,
    binCols: Seq[(String, Int)], conf: SerializableHadoopConf)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new WdsDataWriter(dir, keyIdx, binCols, conf.value, partitionId, taskId)
}

class WdsDataWriter(dir: String, keyIdx: Int,
    binCols: Seq[(String, Int)], conf: Configuration,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val fs = new Path(dir).getFileSystem(conf)
  private val finalPath =
    new Path(dir, f"shard-$partitionId%05d-$taskId.tar")
  private val tmpPath =
    new Path(dir, f".shard-$partitionId%05d-$taskId.tar.inprogress")
  private var out: java.io.OutputStream = _
  private var rows = 0L

  private def ensureOpen(): Unit =
    if (out == null) out = fs.create(tmpPath, true)

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    val key = row.getUTF8String(keyIdx).toString
    binCols.foreach { case (name, i) =>
      if (!row.isNullAt(i))
        TarCodec.writeEntry(out, s"$key.$name", row.getBinary(i))
    }
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    // an empty task still commits a valid (entry-less) shard so the
    // file count equals the task count deterministically
    ensureOpen()
    TarCodec.endArchive(out)
    out.close()
    out = null
    // a leftover same-named shard from an earlier write must not block
    // the rename (HDFS rename-onto-existing fails); last writer wins,
    // the standard task-commit contract
    if (fs.exists(finalPath)) fs.delete(finalPath, false)
    if (!fs.rename(tmpPath, finalPath))
      throw new java.io.IOException(s"rename failed: $tmpPath -> $finalPath")
    WdsWriteCommitted(finalPath.toString, rows)
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    fs.delete(tmpPath, false)
  }

  override def close(): Unit = ()
}

case class WdsWriteCommitted(path: String, rows: Long)
  extends WriterCommitMessage
