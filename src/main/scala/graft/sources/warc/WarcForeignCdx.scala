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

  /** Test/ops seam: compressed cdx blocks read through cluster.idx —
    * the number a point lookup must keep BOUNDED whatever the index
    * size. */
  val blocksRead = new java.util.concurrent.atomic.LongAdder

  /** SURT urlkey for cluster.idx binary search (the CDX sort key:
    * lowercase, scheme dropped, `www.` stripped, default ports
    * dropped, host comma-reversed, `)` + path). Canonicalization
    * slack is tolerated — block selection also reads the FOLLOWING
    * block, and entries are filtered by exact url afterwards. */
  def surtKey(url: String): String = {
    var u = url.toLowerCase(java.util.Locale.ROOT)
    val scheme = u.indexOf("://")
    if (scheme >= 0) u = u.substring(scheme + 3)
    val slash = u.indexOf('/')
    var host = if (slash < 0) u else u.substring(0, slash)
    val path = if (slash < 0) "/" else u.substring(slash)
    val colon = host.indexOf(':')
    var port = ""
    if (colon >= 0) {
      val p = host.substring(colon + 1)
      host = host.substring(0, colon)
      if (p != "80" && p != "443" && p.nonEmpty) port = ":" + p
    }
    if (host.startsWith("www.")) host = host.substring(4)
    host.split('.').reverse.mkString(",") + port + ")" + path
  }

  /** The first full line after byte `pos`, and the line after it —
    * the standard sorted-text-file binary-search probe (`pos` inside
    * a line skips its tail; `pos == 0` returns the first line). */
  private def twoLinesAt(in: org.apache.hadoop.fs.FSDataInputStream,
      fileLen: Long, pos: Long): (String, String) = {
    if (pos >= fileLen) return (null, null)
    in.seek(pos)
    val rd = new java.io.BufferedReader(new java.io.InputStreamReader(
      in, java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
    if (pos > 0 && rd.readLine() == null) return (null, null)
    (rd.readLine(), rd.readLine())
  }

  /** One cluster.idx line: `urlkey ts \t shard \t offset \t length
    * \t seq` — a pointer to ONE independently-gzipped block of a cdx
    * shard (the Common Crawl secondary-index layout). */
  private final case class ClusterBlock(key: String, shard: String,
      offset: Long, length: Long)

  private def parseClusterLine(line: String): Option[ClusterBlock] = {
    if (line == null || line.isEmpty) return None
    val f = line.split('\t')
    if (f.length < 4) return None
    try Some(ClusterBlock(f(0), f(1), f(2).toLong, f(3).toLong))
    catch { case _: NumberFormatException => None }
  }

  /** True when a pushed `url LIKE 'p%'` prefix is expressible as a
    * SURT-key RANGE of the index: the prefix must name a COMPLETE host
    * (scheme plus a '/' after the authority). A host-incomplete prefix
    * like "https://example.com" also matches "https://example.communist
    * .org/…", whose SURT key lives in an unrelated index range — range
    * planning there would silently drop matching rows, so such
    * prefixes stay on the full-load path.
    *
    * Prefixes extending into a QUERY STRING are also refused: this
    * engine's surtKey canonicalizes host order and case only, but the
    * canonicalizer that wrote a foreign cluster.idx (Common Crawl's)
    * additionally SORTS query parameters and rewrites %-escapes, so a
    * prefix like "http://h/p?b=" can have matching records keyed
    * OUTSIDE [k, k+￿] in the authoritative index — range pruning
    * would drop them silently. Path-only prefixes are order-stable
    * under both canonicalizers; query-bearing ones take the full-load
    * path. */
  def rangeablePrefix(urlPrefix: String): Boolean = {
    val s = urlPrefix.indexOf("://")
    s >= 0 && urlPrefix.indexOf('/', s + 3) >= 0 &&
      urlPrefix.indexOf('?') < 0 && urlPrefix.indexOf('#') < 0
  }

  /** Point-lookup / prefix-range load through `cluster.idx`: for each
    * target url (or host-complete url prefix), binary-search the
    * (sorted) secondary index ON DISK — never loading it — for the
    * last block whose first key <= the target's SURT key, then read
    * that block and the one after (point: slack for canonicalization
    * drift) or the contiguous block run covering the prefix's key
    * range plus one (prefix: "all of site X from Common Crawl", the
    * block count proportional to the MATCHING data, not the index).
    * O(targets · log(index) seeks + matchedBlocks · blockBytes)
    * whatever the crawl size — the only shape that survives a 300 GB
    * Common Crawl index. */
  def loadViaCluster(conf: Configuration, indexDir: Path,
      targetUrls: Seq[String], urlPrefixes: Seq[String] = Seq.empty)
      : Map[String, Array[WarcCdx.Entry]] = {
    val fs = indexDir.getFileSystem(conf)
    val ciPath = new Path(indexDir, "cluster.idx")
    val ciLen = fs.getFileStatus(ciPath).getLen
    val wanted = scala.collection.mutable.LinkedHashSet
      .empty[(String, Long, Long)]
    val in = fs.open(ciPath)
    try {
      // last block whose first "urlkey ts" <= loKey (or byte 0 when
      // loKey sorts before the first block — the leading-slack twin
      // of the follower)
      def floorPos(loKey: String): Long = {
        var lo = 0L
        var hi = ciLen
        val (first, _) = twoLinesAt(in, ciLen, 0L)
        if (first == null || first.compareTo(loKey) > 0) return 0L
        while (hi - lo > 1) {
          val mid = lo + (hi - lo) / 2
          val (ln, _) = twoLinesAt(in, ciLen, mid)
          if (ln == null || ln.compareTo(loKey) > 0) hi = mid
          else lo = mid
        }
        lo
      }
      // collect blocks from the floor of loKey through the first block
      // whose key exceeds hiKey (inclusive — the one-past slack block)
      def collect(loKey: String, hiKey: String): Unit = {
        val pos = floorPos(loKey)
        in.seek(pos)
        val rd = new java.io.BufferedReader(new java.io.InputStreamReader(
          in, java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
        if (pos > 0 && rd.readLine() == null) return
        var line = rd.readLine()
        var pastEnd = false
        while (line != null && !pastEnd) {
          if (line.compareTo(hiKey) > 0) pastEnd = true
          parseClusterLine(line)
            .foreach(b => wanted += ((b.shard, b.offset, b.length)))
          line = rd.readLine()
        }
      }
      targetUrls.foreach { u =>
        val key = surtKey(u) + " "
        collect(key, key)                 // floor block + one follower
      }
      urlPrefixes.foreach { p =>
        val k = surtKey(p)
        collect(k, k + "\uFFFF")        // the prefix's whole key range
      }
    } finally in.close()
    val blocks = wanted.toSeq
    val byFile = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[WarcCdx.Entry]]
    val urlSet = targetUrls.toSet
    def matches(u: String): Boolean =
      u != null && (urlSet.contains(u) || urlPrefixes.exists(u.startsWith))
    blocks.foreach { case (shard, offset, length) =>
      blocksRead.increment()
      val sp = new Path(indexDir, shard)
      val raw = fs.open(sp)
      try {
        raw.seek(offset)
        val buf = new Array[Byte](length.toInt)
        var o = 0
        while (o < buf.length) {
          val r = raw.read(buf, o, buf.length - o)
          require(r > 0, s"truncated cdx block in $shard")
          o += r
        }
        val rd = new java.io.BufferedReader(new java.io.InputStreamReader(
          new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(buf), 1 << 16),
          java.nio.charset.StandardCharsets.UTF_8))
        var line = rd.readLine()
        while (line != null) {
          parseLine(line).foreach { case (f, e) =>
            if (matches(e.url))
              byFile.getOrElseUpdate(f,
                scala.collection.mutable.ArrayBuffer.empty) += e
          }
          line = rd.readLine()
        }
      } finally raw.close()
    }
    byFile.iterator
      .map { case (f, es) => f -> es.sortBy(_.offset).toArray }
      .toMap
  }

  /** True when `spec` is a directory carrying a cluster.idx —
    * the sharded Common Crawl index layout. */
  def hasClusterIdx(conf: Configuration, spec: String): Boolean =
    try {
      val p = new Path(spec)
      val fs = p.getFileSystem(conf)
      fs.getFileStatus(p).isDirectory &&
        fs.exists(new Path(p, "cluster.idx"))
    } catch { case _: Exception => false }

  /** Load an index: `spec` is a file, glob, or directory of CDX(J)
    * files (plain or .gz). Returns warc-basename -> offset-sorted
    * entries. Driver-side, O(index lines) — and therefore guarded by
    * `maxLoadBytes`: past the cap the caller should be using the
    * cluster.idx point-lookup path or no pruning at all, never a
    * driver OOM. */
  def load(conf: Configuration, spec: String,
      maxLoadBytes: Long = 1L << 28)
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
    val totalBytes = files.map(_.getLen).sum
    if (totalBytes > maxLoadBytes) {
      // a full Common Crawl index is hundreds of GB — loading it on
      // the driver is the wrong shape at any setting. Point lookups
      // should ride cluster.idx; broad scans read everything anyway,
      // so whole-file planning (no pruning) is the honest fallback.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"cdx index $spec is $totalBytes B > cdxMaxLoadBytes " +
          s"$maxLoadBytes — skipping index-pruned planning (point " +
          "lookups use cluster.idx when present)")
      return Map.empty
    }
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
