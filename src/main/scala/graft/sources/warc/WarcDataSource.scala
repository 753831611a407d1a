package graft.sources.warc

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.pcap.SerializableHadoopConf

/** Web ARChive (WARC 1.0/1.1, ISO 28500) DSv2 source
  * (`format("warc")`) — the container the canonical LLM text pipeline
  * starts from: Common Crawl ships crawl data as `.warc.gz` files
  * where EVERY record is its own gzip member, concatenated.
  *
  * One row per WARC record:
  * (file, rec_type, record_id, url, warc_date, content_type,
  * content_length, http_status, http_content_type, payload) — for
  * records whose block is `application/http` (request/response), the
  * HTTP status line + headers are parsed off and `payload` is the
  * HTTP BODY (the page bytes a corpus wants); for every other record
  * type `payload` is the whole block. `http_status` /
  * `http_content_type` are null on non-HTTP records.
  *
  * Scale shape — the wds/pcap discipline applied to WARC:
  *   - whole-file partitions (member-gzip has no index; mid-file entry
  *     is impossible without decompressing from the start), bin-packed
  *     to `maxPartitionBytes` by [[graft.sources.BinPack]];
  *   - the record walk STREAMS: headers are read line-at-a-time with a
  *     hard line-length cap, the block is materialized ONLY when the
  *     projection needs `payload` — a (url, status) survey of a crawl
  *     never allocates page bytes (`payloadBytesSkipped` metric proves
  *     it); constant memory per task whatever the file size;
  *   - `java.util.zip.GZIPInputStream` reads concatenated members
  *     natively, so member-per-record `.warc.gz` and plain `.warc`
  *     walk identically;
  *   - malformed records REJECT (bad version line, non-numeric or
  *     missing Content-Length, truncated block) — a mis-framed record
  *     would silently corrupt every record after it.
  *
  * Reference: WARC/1.1 (ISO 28500:2017) record grammar — version line,
  * named fields, CRLF CRLF, Content-Length octets of block, CRLF CRLF.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcTable.ReadSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(new CaseInsensitiveStringMap(properties))
}

object WarcTable {
  val ReadSchema: StructType = new StructType()
    .add("file", StringType, nullable = false)
    .add("rec_type", StringType, nullable = false)
    .add("record_id", StringType, nullable = true)
    .add("refers_to", StringType, nullable = true) // revisit -> original
    .add("url", StringType, nullable = true)
    .add("warc_date", StringType, nullable = true)
    .add("content_type", StringType, nullable = true)
    .add("content_length", LongType, nullable = false)
    .add("http_status", IntegerType, nullable = true)
    .add("http_content_type", StringType, nullable = true)
    .add("payload", BinaryType, nullable = true)

  def paths(options: CaseInsensitiveStringMap): Seq[String] =
    graft.sources.PathOptions.paths(options, "warc")

  def listDataFiles(options: CaseInsensitiveStringMap,
      conf: Configuration): Seq[org.apache.hadoop.fs.FileStatus] = {
    val declared = paths(options)
    if (declared.isEmpty)
      throw new IllegalArgumentException("warc source requires a path")
    declared.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse {
        if (fs.exists(path)) Seq(fs.getFileStatus(path)) else Seq.empty
      }
      if (matches.isEmpty)
        throw new java.io.FileNotFoundException(
          s"warc path does not exist: $p")
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

class WarcTable(options: CaseInsensitiveStringMap) extends Table
  with SupportsRead {

  override def name(): String =
    s"warc(${WarcTable.paths(options).mkString(",")})"
  override def schema(): StructType = WarcTable.ReadSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val merged = new util.HashMap[String, String]()
    merged.putAll(options)
    merged.putAll(scanOptions)
    new WarcScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

/** Record-level predicate pushdown: rec_type and url are known from
  * the WARC header BEFORE the block is read, so simple predicates on
  * them skip non-matching records' blocks entirely — a responses-only
  * crawl pipeline never decompresses a request or warcinfo block into
  * memory. Filters stay residual (Spark re-checks them): a
  * byte-skipping optimization, never a semantic contract — the
  * wds/pcap pushdown discipline. */
object WarcRecordFilter {
  import org.apache.spark.sql.sources._

  type Predicate = (String, String) => Boolean
  val acceptAll: Predicate = (_, _) => true

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _: String) => a == "rec_type" || a == "url"
    case In(a, vs) => (a == "rec_type" || a == "url") &&
      vs.forall(_.isInstanceOf[String])
    case StringStartsWith(a, _) => a == "rec_type" || a == "url"
    case _ => false
  }

  def compile(filters: Array[Filter]): Predicate = {
    if (filters.isEmpty) return acceptAll
    val preds: Seq[Predicate] = filters.toSeq.map {
      case EqualTo(a, v: String) =>
        if (a == "rec_type") (t: String, _: String) => t == v
        else (_: String, u: String) => u == v
      case In(a, vs) =>
        val set = vs.map(_.asInstanceOf[String]).toSet
        if (a == "rec_type") (t: String, _: String) => set(t)
        else (_: String, u: String) => set(u)
      case StringStartsWith(a, p) =>
        if (a == "rec_type") (t: String, _: String) => t.startsWith(p)
        else (_: String, u: String) => u != null && u.startsWith(p)
      case other => throw new IllegalArgumentException(
        s"unsupported pushed filter $other")
    }
    // url may legitimately be null (warcinfo records): a pushed url
    // predicate rejects those — matching what the residual filter does
    (t, u) => preds.forall(p => p(t, if (u == null) "" else u))
  }
}

class WarcScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  private var required: StructType = WarcTable.ReadSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    if (options.getBoolean("pushdown", true))
      pushed = filters.filter(WarcRecordFilter.supported)
    filters // everything stays post-scan too (residual re-check)
  }

  override def pushedFilters()
      : Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = new WarcScan(required, options, pushed)
}

/** Executor-visible read counters — the seam proving a payload-pruned
  * crawl survey really skips page bytes (the WdsReadStats pattern). */
object WarcReadStats {
  val recordsRead = new java.util.concurrent.atomic.LongAdder
  val payloadBytesSkipped = new java.util.concurrent.atomic.LongAdder
}

class WarcRecordsMetric extends CustomSumMetric {
  override def name(): String = "recordsRead"
  override def description(): String = "WARC records read"
}

class WarcSkippedBytesMetric extends CustomSumMetric {
  override def name(): String = "payloadBytesSkipped"
  override def description(): String =
    "record block bytes skipped (payload column pruned)"
}

class WarcScan(requiredSchema: StructType,
    options: CaseInsensitiveStringMap,
    pushedFilters: Array[org.apache.spark.sql.sources.Filter] =
      Array.empty) extends Scan with Batch
  with SupportsReportStatistics {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan(columns=[${requiredSchema.fieldNames.mkString(",")}], " +
      s"pushedFilters=[${pushedFilters.mkString(",")}])"

  /** Catalyst-visible size: the summed file bytes. Without this a
    * DSv2 scan reports defaultSizeInBytes (effectively infinite), so
    * a small crawl joined against a big relation could never plan a
    * static broadcast — AQE would have to rescue it at runtime. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val bytes = WarcTable
        .listDataFiles(options, hadoopConf).map(_.getLen).sum
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }

  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new WarcRecordsMetric, new WarcSkippedBytesMetric)

  private def sparkSession = SparkSession.active
  private def hadoopConf: Configuration =
    sparkSession.sessionState.newHadoopConf()

  override def planInputPartitions(): Array[InputPartition] = {
    val maxBytes = Option(options.get("maxBytesPerPartition"))
      .map(v => org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v))
      .getOrElse(sparkSession.sessionState.conf.filesMaxPartitionBytes)
    val openCost = sparkSession.sessionState.conf.filesOpenCostInBytes
    val files = WarcTable.listDataFiles(options, hadoopConf)
      .map(f => f.getPath.toString -> f.getLen)
    graft.sources.BinPack.pack(files, maxBytes, openCost)
      .map(b => WarcInputPartition(b): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(new SerializableHadoopConf(hadoopConf),
      requiredSchema, options.getLong("maxRecordBytes", 1L << 30),
      pushedFilters)
}

case class WarcInputPartition(files: Seq[String]) extends InputPartition

class WarcReaderFactory(conf: SerializableHadoopConf,
    schema: StructType, maxRecordBytes: Long,
    pushedFilters: Array[org.apache.spark.sql.sources.Filter] =
      Array.empty)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcInputPartition].files, conf.value,
      schema, maxRecordBytes, WarcRecordFilter.compile(pushedFilters))
}

/** Open a (possibly compressed) WARC as one stream:
  * `GZIPInputStream` reads concatenated members natively — the Common
  * Crawl record-per-member layout and a whole-file gzip look the same
  * to the walk — and `.warc.zst` decodes through zstd-jni's streaming
  * decoder with `setContinuous` so record-per-frame zstd archives
  * (the archive.org/warcio layout) concatenate the same way. Buffered
  * (the walk reads header lines byte-wise). */
object WarcFileOpener {
  def open(conf: Configuration, pathStr: String): java.io.InputStream = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    val raw = fs.open(path)
    val lower = path.getName.toLowerCase(java.util.Locale.ROOT)
    val decoded =
      if (lower.endsWith(".gz"))
        new java.util.zip.GZIPInputStream(raw, 1 << 16): java.io.InputStream
      else if (lower.endsWith(".zst") || lower.endsWith(".zstd")) {
        val z = new com.github.luben.zstd.ZstdInputStream(raw)
        z.setContinuous(true) // multi-frame: keep reading at frame ends
        z: java.io.InputStream
      } else raw: java.io.InputStream
    new java.io.BufferedInputStream(decoded, 1 << 20)
  }
}

/** One WARC record, parsed. `httpStatus` < 0 and `httpContentType`
  * null when the record is not application/http. */
final class WarcRecordWalk(in: java.io.InputStream, fileName: String,
    needPayload: Boolean, needHttp: Boolean, maxRecordBytes: Long,
    pred: WarcRecordFilter.Predicate = WarcRecordFilter.acceptAll) {

  var recType: String = _
  var recordId: String = _
  var refersTo: String = _
  var url: String = _
  var warcDate: String = _
  var contentType: String = _
  var contentLength: Long = _
  var httpStatus: Int = -1
  var httpContentType: String = _
  var payload: Array[Byte] = _
  var recordsRead = 0L
  var payloadBytesSkipped = 0L

  private val MaxLine = 64 * 1024
  private val lineBuf = new java.io.ByteArrayOutputStream(256)
  private var trash: Array[Byte] = _

  /** One CRLF (or bare-LF, tolerated) line as ISO-8859-1; null at
    * clean EOF BEFORE any byte of the line. Capped: an unbounded
    * "line" is a framing bug, not a header. */
  private def readLine(): String = {
    lineBuf.reset()
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      lineBuf.write(c)
      require(lineBuf.size() <= MaxLine,
        s"WARC header line exceeds $MaxLine B in $fileName")
      c = in.read()
    }
    val n = lineBuf.size()
    val b = lineBuf.toByteArray
    val len = if (n > 0 && b(n - 1) == '\r') n - 1 else n
    new String(b, 0, len, "ISO-8859-1")
  }

  private def readFully(buf: Array[Byte], off: Int, len: Int): Unit = {
    var o = off
    while (o < off + len) {
      val r = in.read(buf, o, off + len - o)
      require(r > 0, s"truncated WARC block in $fileName")
      o += r
    }
  }

  private def skipFully(n: Long): Unit = {
    var rem = n
    while (rem > 0) {
      val s = in.skip(rem)
      if (s > 0) rem -= s
      else {
        if (trash == null) trash = new Array[Byte](1 << 16)
        val r = in.read(trash, 0, math.min(rem, trash.length.toLong).toInt)
        require(r > 0, s"truncated WARC block in $fileName")
        rem -= r
      }
    }
  }

  /** RFC 9112 §7.1 chunked transfer decoding: hex-size[;ext] CRLF
    * chunk CRLF ... 0 CRLF [trailers] CRLF. Strict — a malformed
    * chunk frame rejects rather than returning a half-decoded body. */
  private def dechunk(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length)
    var p = 0
    def line(): String = {
      val s = p
      while (p < raw.length && raw(p) != '\n') p += 1
      require(p < raw.length, s"truncated chunked body in $fileName")
      p += 1
      val e = if (p - 2 >= s && raw(p - 2) == '\r') p - 2 else p - 1
      new String(raw, s, e - s, "ISO-8859-1")
    }
    var done = false
    while (!done) {
      val sizeStr = line().takeWhile(_ != ';').trim
      require(sizeStr.nonEmpty &&
        sizeStr.forall(c => Character.digit(c, 16) >= 0),
        s"malformed chunk size '$sizeStr' in $fileName")
      val n = java.lang.Long.parseLong(sizeStr, 16)
      require(n >= 0 && n <= raw.length - p,
        s"chunk overruns the captured body in $fileName")
      if (n == 0) {
        // consume optional trailers up to the final blank line (or the
        // body's end — some captures truncate right after 0 CRLF)
        var t = if (p < raw.length) line() else ""
        while (t.nonEmpty && p < raw.length) t = line()
        done = true
      } else {
        out.write(raw, p, n.toInt)
        p += n.toInt
        val sep = line()
        require(sep.isEmpty, s"missing CRLF after chunk in $fileName")
      }
    }
    out.toByteArray
  }

  /** Advance to the next MATCHING record; false at clean EOF. */
  def next(): Boolean = {
    while (true) {
      step() match {
        case 0 => return false // clean EOF
        case 1 => return true  // record emitted
        case _ => ()           // pushed-filter skip: walk on
      }
    }
    false
  }

  private def step(): Int = {
    // records are separated by CRLF CRLF (consumed here, leading)
    var line = readLine()
    while (line != null && line.isEmpty) line = readLine()
    if (line == null) return 0
    require(line.startsWith("WARC/"),
      s"not a WARC version line in $fileName: '${line.take(40)}'")
    // named fields until the blank line; case-insensitive names,
    // folded continuations appended (WARC 1.1 §4)
    recType = null; recordId = null; refersTo = null
    url = null; warcDate = null
    contentType = null; contentLength = -1L
    httpStatus = -1; httpContentType = null; payload = null
    var lastVal: String = null
    line = readLine()
    while (line != null && line.nonEmpty) {
      if ((line(0) == ' ' || line(0) == '\t') && lastVal != null) {
        lastVal = lastVal + " " + line.trim
      } else {
        val c = line.indexOf(':')
        require(c > 0, s"malformed WARC field in $fileName: " +
          s"'${line.take(40)}'")
        val name = line.substring(0, c).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        name match {
          case "warc-type" => recType = value
          case "warc-record-id" => recordId = value
          case "warc-refers-to" => refersTo = value
          case "warc-target-uri" => url = value
          case "warc-date" => warcDate = value
          case "content-type" => contentType = value
          case "content-length" =>
            require(value.nonEmpty && value.forall(_.isDigit),
              s"non-numeric WARC Content-Length '$value' in $fileName")
            contentLength = value.toLong
          case _ => ()
        }
        lastVal = value
      }
      line = readLine()
    }
    require(line != null, s"WARC header truncated in $fileName")
    require(recType != null, s"WARC record missing WARC-Type in $fileName")
    require(contentLength >= 0,
      s"WARC record missing Content-Length in $fileName")
    require(contentLength <= maxRecordBytes,
      s"WARC record is $contentLength B > maxRecordBytes " +
        s"$maxRecordBytes in $fileName (raise the option)")
    // pushed rec_type/url predicates are decidable HERE, before a
    // single block byte is read: a responses-only pipeline skips every
    // request/warcinfo block in place (filters stay residual upstream)
    if (!pred(recType, url)) {
      skipFully(contentLength)
      payloadBytesSkipped += contentLength
      return 2
    }
    val isHttp = contentType != null &&
      contentType.toLowerCase(java.util.Locale.ROOT)
        .startsWith("application/http")
    if (isHttp && (needHttp || needPayload)) {
      // HTTP-in-WARC: status line + headers, then the body. The
      // header section is read line-wise COUNTING consumed octets so
      // the body length is exact.
      var consumed = 0L
      def httpLine(): String = {
        lineBuf.reset()
        var c = in.read()
        require(c >= 0, s"truncated HTTP block in $fileName")
        while (c >= 0 && c != '\n') {
          lineBuf.write(c)
          require(lineBuf.size() <= MaxLine,
            s"HTTP header line exceeds $MaxLine B in $fileName")
          c = in.read()
        }
        consumed += lineBuf.size() + 1 // the '\n'
        val n = lineBuf.size()
        val b = lineBuf.toByteArray
        val len = if (n > 0 && b(n - 1) == '\r') n - 1 else n
        new String(b, 0, len, "ISO-8859-1")
      }
      val start = httpLine()
      // response: "HTTP/1.1 200 OK"; request: "GET /x HTTP/1.1"
      if (start.startsWith("HTTP/")) {
        val parts = start.split(" ", 3)
        if (parts.length >= 2 && parts(1).forall(_.isDigit) &&
            parts(1).nonEmpty)
          httpStatus = parts(1).toInt
      }
      var chunked = false
      var h = httpLine()
      while (h.nonEmpty) {
        val c = h.indexOf(':')
        if (c > 0) {
          val hn = h.substring(0, c).trim
          if (hn.equalsIgnoreCase("content-type"))
            httpContentType = h.substring(c + 1).trim
          else if (hn.equalsIgnoreCase("transfer-encoding") &&
              h.substring(c + 1).trim
                .toLowerCase(java.util.Locale.ROOT).contains("chunked"))
            chunked = true
        }
        h = httpLine()
      }
      require(consumed <= contentLength,
        s"HTTP headers overrun the WARC block in $fileName")
      val bodyLen = contentLength - consumed
      if (needPayload) {
        payload = new Array[Byte](bodyLen.toInt)
        readFully(payload, 0, bodyLen.toInt)
        // crawls store HTTP bodies AS CAPTURED: a chunked response
        // keeps its transfer framing in the WARC block, and every
        // real reader de-chunks it (warcio's content_stream). The raw
        // body is already bounded by contentLength, so de-chunking is
        // an in-memory reframe — strict, like everything else here.
        if (chunked) payload = dechunk(payload)
      } else {
        skipFully(bodyLen)
        payloadBytesSkipped += bodyLen
      }
    } else if (needPayload && !isHttp) {
      payload = new Array[Byte](contentLength.toInt)
      readFully(payload, 0, contentLength.toInt)
    } else {
      skipFully(contentLength)
      payloadBytesSkipped += contentLength
    }
    recordsRead += 1
    1
  }
}

class WarcPartitionReader(files: Seq[String], conf: Configuration,
    schema: StructType, maxRecordBytes: Long,
    pred: WarcRecordFilter.Predicate = WarcRecordFilter.acceptAll)
  extends PartitionReader[InternalRow] {

  private val needPayload = schema.fieldNames.contains("payload")
  private val needHttp = needPayload ||
    schema.fieldNames.contains("http_status") ||
    schema.fieldNames.contains("http_content_type")
  private var fileIdx = 0
  private var in: java.io.InputStream = _
  private var walk: WarcRecordWalk = _
  private var fileName: String = _
  private var recordsLocal = 0L
  private var skippedLocal = 0L

  override def next(): Boolean = {
    while (true) {
      if (in == null) {
        if (fileIdx >= files.length) return false
        fileName = new Path(files(fileIdx)).getName
        in = WarcFileOpener.open(conf, files(fileIdx))
        walk = new WarcRecordWalk(in, fileName, needPayload, needHttp,
          maxRecordBytes, pred)
      }
      if (walk.next()) return true
      recordsLocal += walk.recordsRead
      skippedLocal += walk.payloadBytesSkipped
      in.close()
      in = null
      walk = null
      fileIdx += 1
    }
    false
  }

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  override def get(): InternalRow =
    InternalRow.fromSeq(schema.fieldNames.toSeq.map {
      case "file" => UTF8String.fromString(fileName)
      case "rec_type" => utf8(walk.recType)
      case "record_id" => utf8(walk.recordId)
      case "refers_to" => utf8(walk.refersTo)
      case "url" => utf8(walk.url)
      case "warc_date" => utf8(walk.warcDate)
      case "content_type" => utf8(walk.contentType)
      case "content_length" => walk.contentLength
      case "http_status" =>
        if (walk.httpStatus < 0) null else walk.httpStatus
      case "http_content_type" => utf8(walk.httpContentType)
      case "payload" => walk.payload
    })

  private def totalRecords: Long =
    recordsLocal + (if (walk != null) walk.recordsRead else 0L)
  private def totalSkipped: Long =
    skippedLocal + (if (walk != null) walk.payloadBytesSkipped else 0L)

  override def currentMetricsValues(): Array[CustomTaskMetric] = Array(
    new CustomTaskMetric {
      override def name(): String = "recordsRead"
      override def value(): Long = totalRecords
    },
    new CustomTaskMetric {
      override def name(): String = "payloadBytesSkipped"
      override def value(): Long = totalSkipped
    })

  override def close(): Unit = {
    WarcReadStats.recordsRead.add(totalRecords)
    WarcReadStats.payloadBytesSkipped.add(totalSkipped)
    if (in != null) { in.close(); in = null }
    walk = null
    recordsLocal = 0
    skippedLocal = 0
  }
}
