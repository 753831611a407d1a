package graft.sources.warc

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Standard CDX(J) crawl-index consumption — the single most
  * realistic 100 TB workflow: point lookups and pruned scans over a
  * crawl the engine did NOT index itself. Real crawls ship with a
  * SURT-keyed CDX index (Common Crawl's `cdx-*.gz`, pywb/warcio's
  * `.cdxj`); both line forms are accepted:
  *
  *   - CDXJ: `urlkey timestamp {"url":…,"mime":…,"status":…,
  *     "digest":…,"length":…,"offset":…,"filename":…}`
  *   - classic 11-field (` CDX N b a m s k r M S V g` header):
  *     `urlkey timestamp url mime status digest redirect meta
  *     length offset filename`
  *
  * `offset`/`length` are the record's gzip-member extent in the named
  * `.warc.gz` — exactly the slice coordinates
  * [[WarcCdx.slicesFromEntries]] plans from, so a foreign index slots
  * into the same pruned-planning path as the engine's own `.wcdx`.
  *
  * Wired via `option("cdx", <file|glob|dir>)` — an EXPLICIT opt-in:
  * pruned plans read only the records the index lists (the
  * wayback-machine access model where the CDX is the source of truth
  * for captures), so the caller asserts the index covers the records
  * the query can match. Pushed filters stay residual above the scan
  * regardless, so listed-and-read records are never mis-evaluated. */
object WarcForeignCdx {

  private def isCdxName(name: String): Boolean = {
    val lower = name.toLowerCase(java.util.Locale.ROOT)
    val base = if (lower.endsWith(".gz")) lower.dropRight(3) else lower
    base.endsWith(".cdx") || base.endsWith(".cdxj") ||
      // Common Crawl index shards are named cdx-00000.gz etc.
      lower.matches("cdx-\\d+(\\.gz)?")
  }

  /** 14-digit CDX timestamp -> ISO 8601 (the warc_date column form,
    * so pushed date-range predicates prune foreign indexes too). */
  private[warc] def isoDate(ts: String): String =
    if (ts.length == 14 && ts.forall(_.isDigit))
      s"${ts.substring(0, 4)}-${ts.substring(4, 6)}-" +
        s"${ts.substring(6, 8)}T${ts.substring(8, 10)}:" +
        s"${ts.substring(10, 12)}:${ts.substring(12, 14)}Z"
    else null

  private def opt(v: String): String =
    if (v == null || v.isEmpty || v == "-") null else v

  /** mime "warc/revisit" marks a revisit capture in both CDX forms;
    * everything else a CDX indexes is a response capture. */
  private def entryOf(ts: String, url: String, mime: String,
      status: String, digest: String, length: String, offset: String)
      : Option[WarcCdx.Entry] = {
    val off = opt(offset)
    val len = opt(length)
    if (off == null || len == null) return None
    if (!off.forall(_.isDigit) || !len.forall(_.isDigit)) return None
    val m = opt(mime)
    val recType = if (m == "warc/revisit") "revisit" else "response"
    val st = opt(status)
    val statusInt =
      if (st != null && st.forall(_.isDigit)) st.toInt else -1
    Some(WarcCdx.Entry(off.toLong, len.toLong, recType, opt(url),
      isoDate(ts), statusInt,
      if (recType == "revisit") null else m, opt(digest)))
  }

  /** One CDX(J) line -> (warc file basename, entry); None for header/
    * comment/malformed lines — a foreign index never crashes the
    * planner, it just prunes less. */
  def parseLine(line: String): Option[(String, WarcCdx.Entry)] = {
    if (line.isEmpty || line.startsWith("#") ||
      line.startsWith(" CDX") || line.startsWith("CDX ")) return None
    val sp1 = line.indexOf(' ')
    if (sp1 <= 0) return None
    val sp2 = line.indexOf(' ', sp1 + 1)
    if (sp2 < 0) return None
    val ts = line.substring(sp1 + 1, sp2)
    val rest = line.substring(sp2 + 1)
    if (rest.startsWith("{")) {
      // CDXJ JSON payload (driver-side parse; json4s ships with Spark)
      import org.json4s._
      val j = try jackson.JsonMethods.parse(rest) catch {
        case _: Exception => return None
      }
      def str(k: String): String = j \ k match {
        case JString(v) => v
        case JInt(v) => v.toString
        case _ => null
      }
      val filename = str("filename")
      if (filename == null) return None
      entryOf(ts, str("url"), str("mime"), str("status"),
        str("digest"), str("length"), str("offset"))
        .map(e => new Path(filename).getName -> e)
    } else {
      // classic 11-field CDX
      val f = line.split(' ')
      if (f.length < 11) return None
      entryOf(ts, f(2), f(3), f(4), f(5), f(8), f(9))
        .map(e => new Path(f(10)).getName -> e)
    }
  }

  /** Load an index: `spec` is a file, glob, or directory of CDX(J)
    * files (plain or .gz). Returns warc-basename -> offset-sorted
    * entries. Driver-side, O(index lines) — the index of a 100 TB
    * crawl is GBs, not TBs, and only loaded when `option("cdx")` is
    * set AND predicates were pushed. */
  def load(conf: Configuration, spec: String)
      : Map[String, Array[WarcCdx.Entry]] = {
    val path = new Path(spec)
    val fs = path.getFileSystem(conf)
    val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse {
      if (fs.exists(path)) Seq(fs.getFileStatus(path)) else Seq.empty
    }
    val files = matches.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && isCdxName(s.getPath.getName))
      else Seq(st)
    }
    require(files.nonEmpty, s"cdx index not found: $spec")
    val byFile = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[WarcCdx.Entry]]
    files.foreach { st =>
      val raw = fs.open(st.getPath)
      val in: java.io.InputStream =
        if (st.getPath.getName.toLowerCase(java.util.Locale.ROOT)
            .endsWith(".gz"))
          new java.util.zip.GZIPInputStream(raw, 1 << 16)
        else raw
      val rd = new java.io.BufferedReader(new java.io.InputStreamReader(
        in, java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
      try {
        var line = rd.readLine()
        while (line != null) {
          parseLine(line).foreach { case (f, e) =>
            byFile.getOrElseUpdate(f,
              scala.collection.mutable.ArrayBuffer.empty) += e
          }
          line = rd.readLine()
        }
      } finally rd.close()
    }
    byFile.iterator
      .map { case (f, es) => f -> es.sortBy(_.offset).toArray }
      .toMap
  }
}
