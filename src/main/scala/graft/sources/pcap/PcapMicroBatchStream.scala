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
  *
  * Driver-state compaction (`maxFileAgeMs`, default 7 days — the same
  * retention contract as Spark's file source `maxFileAge`): a landing
  * stream that rotates captures every few seconds for months would
  * otherwise grow the seen-files log without bound. Files whose mtime
  * falls more than `maxFileAgeMs` behind the newest mtime seen are
  * (a) ignored on discovery — a too-late landing is dropped, which is
  * what makes forgetting them safe — and (b) purged from the seen map
  * and, once their offset range is COMMITTED, from the ordered log
  * (`base` counts purged prefix entries so offsets keep their absolute
  * meaning). Tracked state is therefore O(files within the retention
  * window + uncommitted backlog), not O(files ever landed)
  * (StreamCompactionSpec streams thousands of files and pins the
  * bound). Restart: offsets carry the MAXIMUM processed (mtime, path)
  * alongside the count, so a fresh instance whose rebuilt listing lost
  * the aged-out prefix splits the listing into processed (at-or-before
  * the marker) and pending (after it) and rebases the count space over
  * what remains — exactly-once holds as long as still-unprocessed
  * files are not yet past the horizon (retention must exceed the worst
  * backlog + restart gap) and the restart does not recover across a
  * STRAGGLER admission (a file landing with an mtime behind
  * already-discovered files): stragglers are exactly-once within a
  * run and refresh() logs a warning when one is admitted, but a
  * listing cannot reconstruct where an unprocessed straggler sat in
  * discovery order, so restart windows spanning one may replay or
  * skip it.
  */
class PcapMicroBatchStream(
    options: org.apache.spark.sql.util.CaseInsensitiveStringMap,
    schema: StructType,
    conf: Configuration)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private case class FileEntry(path: String, mtime: Long)

  private val maxFileAgeMs: Long = {
    val v = options.getLong("maxFileAgeMs", 7L * 24 * 3600 * 1000)
    require(v > 0, s"maxFileAgeMs must be positive, got $v")
    v
  }

  /** stable discovery order, minus the compacted prefix: absolute
    * offset counts map to `tail(count - base)` */
  @volatile private var tail: Vector[FileEntry] = Vector.empty
  /** entries purged from the front of the discovery order (committed
    * AND past the retention horizon) */
  @volatile private var base: Int = 0
  /** path -> mtime for dedup, bounded to the retention window */
  private val seen = scala.collection.mutable.HashMap.empty[String, Long]
  /** newest mtime ever seen; the retention horizon hangs off it (event
    * time, not wall clock — deterministic under synthetic mtimes) */
  private var latestMtime: Long = Long.MinValue
  /** absolute count covered by the last commit (compaction's safe line) */
  @volatile private var committed: Int = 0

  private def horizon: Long =
    if (latestMtime == Long.MinValue) Long.MinValue
    else latestMtime - maxFileAgeMs

  private def refresh(): Unit = synchronized {
    val found = PcapTable.paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      matches.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(_.isFile)
            // the SHARED data-file predicate (PcapTable.isDataFile):
            // admitting what the batch listing skips — e.g. a .tsidx
            // sidecar a landing ETL wrote next to its capture — would
            // plan a partition whose reader throws on the magic check
            .filter(s => PcapTable.isDataFile(s.getPath.getName))
        else Seq(st)
      }
    }.map(st => FileEntry(st.getPath.toString, st.getModificationTime))
    found.foreach(f => latestMtime = math.max(latestMtime, f.mtime))
    val h = horizon
    // age-filter BEFORE the seen-check: a file older than the horizon is
    // never admitted, so forgetting it from `seen` cannot re-admit it
    val fresh = found
      .filter(_.mtime >= h)
      .filterNot(f => seen.contains(f.path))
      .sortBy(f => (f.mtime, f.path))
    // stragglers (mtime at-or-below something already discovered) are
    // admitted and processed exactly-once WITHIN this run, but a
    // restart recovering across one cannot fully reconstruct discovery
    // order from a listing (see the class doc's restart contract) —
    // surface the inversion so operators know the window existed
    if (fresh.nonEmpty && tail.nonEmpty) {
      val newest = tail.last
      val stragglers = fresh.count(f => f.mtime < newest.mtime ||
        (f.mtime == newest.mtime && f.path < newest.path))
      if (stragglers > 0)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"pcap stream: $stragglers file(s) landed with mtimes behind " +
            "already-discovered files; exactly-once holds in this run, " +
            "but a restart recovering across this admission may not " +
            "reconstruct the order (see maxFileAgeMs contract)")
    }
    fresh.foreach(f => seen(f.path) = f.mtime)
    tail = tail ++ fresh
    // compact the seen map to the retention window
    seen.filterInPlace((_, m) => m >= h)
    // compact the committed, aged-out prefix of the ordered log
    var purge = 0
    while (purge < tail.length && base + purge < committed &&
        tail(purge).mtime < h) purge += 1
    if (purge > 0) { tail = tail.drop(purge); base += purge }
    PcapMicroBatchStream.lastTrackedState = (seen.size, tail.length, base)
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

  /** Whether this instance has aligned its count space against a
    * checkpoint-recovered offset (done at most once, on the first
    * offset the engine hands us). */
  private var aligned = false

  /** Restart alignment: a fresh instance rebuilds its listing, which no
    * longer holds files that aged past the horizon — so the recovered
    * absolute count and the rebuilt listing disagree by HOWEVER MANY
    * PROCESSED files aged out, whether or not the count exceeds the
    * listing length (a count-overflow check alone silently skips the
    * oldest pending files whenever fewer processed files aged out than
    * pending ones exist). The offset's (mtime, path) marker splits the
    * listing exactly: entries at-or-before it were processed and sit
    * below the count, entries after it are pending. Runs once per
    * instance; a live query's first offset is count 0 (nothing to
    * align). Legacy bare-count offsets fall back to assuming the
    * listing's prefix was processed. */
  private def rebase(off: PcapStreamOffset): Unit = synchronized {
    if (!aligned) {
      aligned = true
      if (off.count > 0) {
        refresh()
        val processed = off.last match {
          case Some((m, p)) =>
            tail.count(f => f.mtime < m || (f.mtime == m && f.path <= p))
          case None => math.min(tail.length, off.count)
        }
        base = math.max(0, off.count - processed)
        // an AvailableNow snapshot taken in prepare() counted the same
        // files under the pre-alignment numbering — renumber it, or the
        // drain target stays below `start` and the run drains nothing
        if (availableNowEnd >= 0) availableNowEnd = base + tail.length
      }
    }
  }

  override def prepareForTriggerAvailableNow(): Unit = {
    refresh()
    availableNowEnd = base + tail.length
  }

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** Offset for absolute position `end`. The marker is the MAXIMUM
    * (mtime, path) over every entry at-or-below `end` — carried forward
    * from `from`'s marker and extended over the new batch — NOT simply
    * the entry at `end`-1: a late-landing straggler admitted after
    * newer files sits at a high count with a LOW key, and a marker that
    * regressed to the straggler's key would make a later restart count
    * the newer processed files as pending (replaying them). */
  private def offsetAt(end: Int, from: PcapStreamOffset): PcapStreamOffset = {
    var best = from.last
    var i = math.max(from.count, base) - base
    val stop = math.min(end - base, tail.length)
    while (i < stop) {
      val e = tail(i)
      if (best.isEmpty || e.mtime > best.get._1 ||
          (e.mtime == best.get._1 && e.path > best.get._2))
        best = Some((e.mtime, e.path))
      i += 1
    }
    PcapStreamOffset(end, best)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val so = start.asInstanceOf[PcapStreamOffset]
    rebase(so) // one-time alignment against a recovered checkpoint
    if (availableNowEnd < 0) refresh() // AvailableNow reads its snapshot
    val s = so.count
    if (s > committed) committed = s // a recovered start is durably logged
    val avail = if (availableNowEnd < 0) base + tail.length else availableNowEnd
    val end = limit match {
      case mf: ReadMaxFiles => math.min(avail, s + mf.maxFiles())
      case _                => avail
    }
    offsetAt(math.max(end, s), so)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset =
    PcapStreamOffset.parse(json)

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[PcapStreamOffset].count
    if (e > committed) committed = e // next refresh may purge below this
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    // restart replay: Spark re-plans the last uncommitted batch on a
    // fresh instance WITHOUT calling latestOffset first — rebase against
    // the batch start so the listing is loaded and counts line up
    rebase(start.asInstanceOf[PcapStreamOffset])
    val s = start.asInstanceOf[PcapStreamOffset].count
    val e = end.asInstanceOf[PcapStreamOffset].count
    // a replayed FIRST batch recovers start = count 0, which gives
    // rebase nothing to align — the listing may simply not be loaded
    // yet on this fresh instance; plan from the real directory, never
    // from an empty tail (which would silently commit an empty batch
    // and lose the files below the recovered end offset forever)
    if (e > base + tail.length) refresh()
    require(s >= base,
      s"batch [$s,$e) reaches below the compacted prefix ($base); " +
        "only committed offsets are ever purged, so this is a bug")
    // one partition per newly-landed file (micro-batches are small by
    // construction; batch reads do the bin-packing)
    tail.slice(s - base, e - base).map(f =>
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

object PcapMicroBatchStream {
  /** Last refresh's (seen-map size, ordered-log tail size, purged
    * prefix) — a test gauge for the compaction bound (the instance is
    * buried inside the running query, so specs read this instead). */
  @volatile private[graft] var lastTrackedState: (Int, Int, Int) = (0, 0, 0)
}

/** `count` is the absolute position in the discovery order; `last` is
  * the (mtime, path) of the entry just below it — the restart marker
  * that lets a rebuilt listing split into processed vs pending after
  * the in-memory log compacted (see [[PcapMicroBatchStream]] doc).
  * Serialized as `count` alone (legacy-compatible) or
  * `count|mtime|path` — path last so embedded `|` cannot ambiguate. */
case class PcapStreamOffset(count: Int,
    last: Option[(Long, String)] = None) extends Offset {
  override def json(): String = last match {
    case Some((m, p)) => s"$count|$m|$p"
    case None         => count.toString
  }
}

object PcapStreamOffset {
  def parse(s: String): PcapStreamOffset = s.trim.split("\\|", 3) match {
    case Array(c)       => PcapStreamOffset(c.toInt)
    case Array(c, m, p) => PcapStreamOffset(c.toInt, Some((m.toLong, p)))
    case _ => throw new IllegalArgumentException(s"bad pcap offset: $s")
  }
}
