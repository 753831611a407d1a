package graft.sources.warc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.pcap.SerializableHadoopConf

/** Batch WRITE side of the `warc` format — corpus → crawl-archive
  * export in the Common Crawl framing (one gzip member per record),
  * with the `.wcdx` record-offset sidecar written AT COMMIT for free:
  * the writer knows every member offset as it streams, so an exported
  * lake is born range-splittable, point-look-up-able, and
  * COUNT(*)-from-metadata — no after-the-fact indexing pass.
  *
  * Contract: `url` (STRING) and `payload` (BINARY) are required.
  * Optional columns, all by name: `rec_type` (default `response`),
  * `record_id` (default a deterministic `<urn:uuid:...>` from the
  * row's url + position), `warc_date` (default the `warcDate`
  * option), `http_status` (INT — when present and non-null the
  * payload is wrapped as an `application/http` response block with
  * status line + Content-Type/Content-Length headers, the shape the
  * scan splits back apart), `http_content_type` (STRING, default
  * `text/plain`). Non-HTTP records (`http_status` absent/null) write
  * the payload as the raw block with `content_type` =
  * `contentType` option (default `application/octet-stream`).
  *
  * One part file per task (`part-<partition>-<task>.warc.gz`;
  * `option("container","warc")` writes plain). Task output commits by
  * atomic rename from an `.inprogress` temp; aborted tasks delete it.
  * The sidecar is written AFTER the warc is visible (a reader listing
  * mid-write sees at worst an unindexed file, never a sidecar for a
  * missing file). mode("overwrite") arrives as truncate(): stale data
  * files and their sidecars are swept at batch commit, after every
  * task committed.
  *
  * Scale: writers stream row-by-row — constant memory per task
  * (one record) whatever the partition size; file count = task count
  * via the usual repartition(n).
  */
class WarcWriteBuilder(options: CaseInsensitiveStringMap,
    info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {

  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write {
    private def validated: (String, WarcWriteCols, Boolean, Boolean,
        String, String) = {
      val schema = info.schema()
      def idxOf(name: String, tpe: org.apache.spark.sql.types.DataType,
          required: Boolean): Int = {
        val i = schema.fieldNames.indexOf(name)
        if (i < 0) {
          if (required) throw new IllegalArgumentException(
            s"warc write requires a $name column; got " +
              schema.simpleString)
          -1
        } else {
          if (schema.fields(i).dataType != tpe)
            throw new IllegalArgumentException(
              s"warc write: column $name must be ${tpe.simpleString}; " +
                s"got ${schema.fields(i).dataType.simpleString}")
          i
        }
      }
      val cols = WarcWriteCols(
        url = idxOf("url", StringType, required = true),
        payload = idxOf("payload", BinaryType, required = true),
        recType = idxOf("rec_type", StringType, required = false),
        recordId = idxOf("record_id", StringType, required = false),
        warcDate = idxOf("warc_date", StringType, required = false),
        httpStatus = idxOf("http_status", IntegerType, required = false),
        httpContentType =
          idxOf("http_content_type", StringType, required = false))
      val dir = WarcTable.paths(options) match {
        case Seq(one) => one
        case other => throw new IllegalArgumentException(
          s"warc write requires exactly one output path; got $other")
      }
      val container = options.getOrDefault("container", "warc.gz")
        .toLowerCase(java.util.Locale.ROOT)
      require(container == "warc.gz" || container == "warc",
        s"container must be warc.gz or warc, got $container")
      (dir, cols, container == "warc.gz",
        options.getBoolean("writeWcdx", true),
        options.getOrDefault("warcDate", "1970-01-01T00:00:00Z"),
        options.getOrDefault("contentType", "application/octet-stream"))
    }

    override def toBatch: BatchWrite = {
      val (dir, cols, gz, writeIndex, date, ct) = validated
      // part names carry the write job's identity so exports from a
      // FRESH session can never collide with an earlier session's
      // parts (task ids restart per application — the wds lesson)
      val jobTag = Option(info.queryId()).filter(_.nonEmpty)
        .getOrElse(java.util.UUID.randomUUID().toString)
        .replaceAll("[^0-9a-fA-F]", "").take(8)
      new WarcBatchWrite(dir, cols, truncateFirst, gz, writeIndex,
        date, ct, jobTag)
    }

    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      if (truncateFirst) throw new IllegalArgumentException(
        "warc streaming sink is append-only (complete/truncate modes " +
          "would rewrite every prior epoch's archives)")
      val (dir, cols, gz, writeIndex, date, ct) = validated
      // epoch archives carry the write job's identity so appends from
      // a FRESH session can never collide with an earlier session's
      val jobTag = Option(info.queryId()).filter(_.nonEmpty)
        .getOrElse(java.util.UUID.randomUUID().toString)
        .replaceAll("[^0-9a-fA-F]", "").take(8)
      new WarcStreamingWrite(dir, cols, gz, writeIndex, date, ct, jobTag)
    }
  }
}

/** STREAMING write side — the fetcher-side landing path: each epoch
  * commits its own atomically-renamed, epoch-keyed archives
  * (`crawl-<job>-e<epoch>-p<partition>.warc.gz`) with their `.wcdx`
  * sidecars. Final names carry (job, epoch, partition) — no task id —
  * so an epoch REPLAY after a checkpoint restart replaces its own
  * files idempotently; tmp paths carry the attempt-unique task id so
  * a speculative twin can never interleave bytes into the attempt the
  * commit coordinator picks (the wds streaming discipline). Empty
  * partitions still commit (a record-less archive), keeping the
  * per-epoch file set deterministic under replay. */
class WarcStreamingWrite(dir: String, cols: WarcWriteCols, gz: Boolean,
    writeIndex: Boolean, defaultDate: String, defaultContentType: String,
    jobTag: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory = {
    val p = new Path(dir)
    p.getFileSystem(conf.value).mkdirs(p)
    new WarcStreamingWriterFactory(dir, cols, conf, gz, writeIndex,
      defaultDate, defaultContentType, jobTag)
  }

  // file visibility is per-task atomic rename; the engine's offset log
  // plus idempotent epoch-keyed names give end-to-end exactly-once
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

case class WarcWriteCols(url: Int, payload: Int, recType: Int,
    recordId: Int, warcDate: Int, httpStatus: Int, httpContentType: Int)

class WarcBatchWrite(dir: String, cols: WarcWriteCols,
    truncateFirst: Boolean, gz: Boolean, writeIndex: Boolean,
    defaultDate: String, defaultContentType: String, jobTag: String)
  extends BatchWrite {

  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val p = new Path(dir)
    p.getFileSystem(conf.value).mkdirs(p)
    new WarcDataWriterFactory(dir, cols, conf, gz, writeIndex,
      defaultDate, defaultContentType, jobTag)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    if (truncateFirst) {
      // overwrite semantics, the wds sweep: once every task committed,
      // drop data files (and their sidecars) not written by THIS job;
      // '_'-prefixed markers survive
      val mine = messages.collect {
        case WarcWriteCommitted(p) if p.nonEmpty => new Path(p).getName
      }.toSet
      val dp = new Path(dir)
      val fs = dp.getFileSystem(conf.value)
      if (fs.exists(dp))
        fs.listStatus(dp).foreach { st =>
          val n = st.getPath.getName
          val keep = n.startsWith(".") || n.startsWith("_") ||
            mine.contains(n) ||
            (WarcCdx.isSidecar(n) &&
              mine.contains(n.stripSuffix(WarcCdx.SidecarSuffix)))
          if (st.isFile && !keep) fs.delete(st.getPath, false)
        }
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class WarcStreamingWriterFactory(dir: String, cols: WarcWriteCols,
    conf: SerializableHadoopConf, gz: Boolean, writeIndex: Boolean,
    defaultDate: String, defaultContentType: String, jobTag: String)
  extends org.apache.spark.sql.connector.write.streaming
    .StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(dir, cols, conf, gz, writeIndex,
      defaultDate, defaultContentType,
      baseName = f"crawl-$jobTag-e$epochId%06d-p$partitionId%05d",
      tmpTag = s".t$taskId", replaceOnCommit = true)
}

class WarcDataWriterFactory(dir: String, cols: WarcWriteCols,
    conf: SerializableHadoopConf, gz: Boolean, writeIndex: Boolean,
    defaultDate: String, defaultContentType: String, jobTag: String)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new WarcDataWriter(dir, cols, conf, gz, writeIndex, defaultDate,
      defaultContentType,
      baseName = f"part-$jobTag-$partitionId%05d-$taskId",
      tmpTag = "", replaceOnCommit = false)
}

class WarcDataWriter(dir: String, cols: WarcWriteCols,
    conf: SerializableHadoopConf, gz: Boolean, writeIndex: Boolean,
    defaultDate: String, defaultContentType: String,
    baseName: String, tmpTag: String, replaceOnCommit: Boolean)
  extends DataWriter[InternalRow] {

  private val fs = new Path(dir).getFileSystem(conf.value)
  private val finalPath = new Path(dir,
    baseName + "." + (if (gz) "warc.gz" else "warc"))
  // dot-prefixed (so a concurrent listing never reads half a file as
  // data) and attempt-unique via tmpTag on the streaming path
  // (batch baseNames already carry the task id)
  private val tmpPath = new Path(dir,
    "." + finalPath.getName + tmpTag + ".inprogress")
  private val raw = fs.create(tmpPath, true)
  private var written = 0L // container offset = bytes flushed to raw
  private val counting = new java.io.OutputStream {
    private val buffered = new java.io.BufferedOutputStream(raw, 1 << 20)
    override def write(b: Int): Unit = { buffered.write(b); written += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      buffered.write(b, off, len); written += len
    }
    override def flush(): Unit = buffered.flush()
    override def close(): Unit = buffered.close()
  }
  private val entries =
    scala.collection.mutable.ArrayBuffer.empty[WarcCdx.Entry]
  private var rows = 0L

  private def opt(row: InternalRow, idx: Int): String =
    if (idx < 0 || row.isNullAt(idx)) null
    else row.getUTF8String(idx).toString

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(cols.url) && !row.isNullAt(cols.payload),
      "warc write: url and payload must be non-null")
    val url = row.getUTF8String(cols.url).toString
    val payload = row.getBinary(cols.payload)
    val recType = Option(opt(row, cols.recType)).getOrElse("response")
    val date = Option(opt(row, cols.warcDate)).getOrElse(defaultDate)
    // default ids are (baseName, row) — deterministic under epoch
    // replay, unique across partitions and (for batch) attempts
    val recordId = Option(opt(row, cols.recordId)).getOrElse(
      s"<urn:uuid:graft-$baseName-$rows>")
    val status =
      if (cols.httpStatus < 0 || row.isNullAt(cols.httpStatus)) -1
      else row.getInt(cols.httpStatus)
    val httpCt = Option(opt(row, cols.httpContentType))
      .getOrElse(if (status >= 0) "text/plain" else null)
    val (contentType, block) =
      if (status >= 0) {
        // application/http response block — the shape the scan's HTTP
        // split parses back apart with exact octet accounting
        val reason = if (status == 200) "OK" else "Status"
        val head = (s"HTTP/1.1 $status $reason\r\n" +
          s"Content-Type: $httpCt\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n")
          .getBytes("US-ASCII")
        val b = new Array[Byte](head.length + payload.length)
        head.copyToArray(b)
        payload.copyToArray(b, head.length)
        ("application/http; msgtype=response", b)
      } else (defaultContentType, payload)
    val rec = WarcSynth.record(Seq(
      "WARC-Type" -> recType,
      "WARC-Record-ID" -> recordId,
      "WARC-Date" -> date,
      "WARC-Target-URI" -> url,
      "Content-Type" -> contentType), block)
    val offset = written
    if (gz) WarcSynth.gzipMembers(Iterator(rec), counting)
    else counting.write(rec, 0, rec.length)
    entries += WarcCdx.Entry(offset, 0L, recType, url, date, status,
      if (status >= 0) httpCt else null, WarcCdx.md5Hex(payload))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    counting.close()
    if (rows == 0 && !replaceOnCommit) { // batch: empty -> no file
      fs.delete(tmpPath, false)
      WarcWriteCommitted("")
    } else {
      if (fs.exists(finalPath)) {
        if (replaceOnCommit) fs.delete(finalPath, false) // epoch replay
        else throw new java.io.IOException(
          s"warc part already exists: $finalPath — part names are " +
            "unique per write job, so this is another job's data; " +
            "refusing to replace it")
      }
      if (!fs.rename(tmpPath, finalPath))
        throw new java.io.IOException(
          s"warc write: rename failed for $finalPath")
      // sidecar AFTER the warc is visible (the .tsidx discipline)
      if (writeIndex)
        WarcCdx.writeSidecar(fs, finalPath,
          if (gz) "member-gzip" else "plain", entries, written)
      WarcWriteCommitted(finalPath.toString)
    }
  }

  override def abort(): Unit = {
    try counting.close() catch { case _: Exception => () }
    fs.delete(tmpPath, false)
  }

  override def close(): Unit = ()
}

case class WarcWriteCommitted(path: String) extends WriterCommitMessage
