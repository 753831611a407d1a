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
  * alongside the count, PLUS a bounded journal of every STRAGGLER
  * admission (a file landing with an mtime behind already-discovered
  * files) still inside the retention window, recorded with its
  * absolute discovery index. A fresh instance whose rebuilt listing
  * lost the aged-out prefix then splits the listing exactly: a
  * journaled file is processed iff its recorded index is below the
  * recovered count; a non-journaled file is processed iff its
  * (mtime, path) key is at-or-before the marker — sound because every
  * pending NON-straggler provably sorts after the max processed key.
  * Pending stragglers are re-slotted at their recorded discovery
  * positions, so replayed uncommitted batches plan exactly the files
  * the original attempt planned (round-8; StreamCompactionSpec kills
  * and restarts across a pending-straggler admission).
  *
  * Remaining honest caveats, both outside what a listing can ever
  * reconstruct: (a) a file landing with a REGRESSIVE mtime while no
  * query is running was never admitted by any run, so a restart cannot
  * distinguish it from processed history — it is skipped; rebase()
  * logs an ERROR when this is detectable (more in-window files sort
  * below the marker than the recovered count admits); (b) exactly-once
  * requires retention to exceed the worst backlog + restart gap.
  * Driver-state purging is gated STRICTLY on the engine's commit()
  * callback (never inferred from a recovered start offset), so runs
  * with asynchronous progress tracking cannot purge entries a restart
  * might still replay.
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
  /** maximum (mtime, path) key over every file ever DISCOVERED — the
    * straggler test (admission below this key) must use the true max,
    * not tail.last, which itself regresses after a straggler wave */
  private var maxKey: Option[(Long, String)] = None
  /** straggler journal: (absolute discovery index, mtime, path) for
    * every straggler admission still inside the retention window —
    * carried in offsets so a restart can reconstruct discovery order */
  @volatile private var journal: Vector[(Int, Long, String)] = Vector.empty

  private def keyLt(a: (Long, String), b: (Long, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

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
    // stragglers (key below the max ever discovered) are admitted and
    // JOURNALED at their absolute discovery index, so both this run and
    // any restart recovering across the admission stay exactly-once
    // (the offset carries the in-window journal; see the class doc)
    var admitted = 0
    var newStragglers = 0
    fresh.foreach { f =>
      val k = (f.mtime, f.path)
      if (maxKey.exists(mk => keyLt(k, mk))) {
        journal = journal :+ ((base + tail.length + admitted, f.mtime, f.path))
        newStragglers += 1
      } else maxKey = Some(k)
      admitted += 1
    }
    if (newStragglers > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"pcap stream: $newStragglers file(s) landed with mtimes behind " +
          "already-discovered files; admission journaled — exactly-once " +
          "holds in this run and across restarts within the retention " +
          "window (see maxFileAgeMs contract)")
    fresh.foreach(f => seen(f.path) = f.mtime)
    tail = tail ++ fresh
    // compact the seen map and the straggler journal to the retention
    // window (an aged-out straggler can never be re-admitted, so its
    // journal entry has no reader left)
    seen.filterInPlace((_, m) => m >= h)
    journal = journal.filter(_._2 >= h)
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
    * pending ones exist).
    *
    * Classification (exact, round-8): a file in the offset's straggler
    * journal is processed iff its recorded discovery index is below the
    * count; any other file is processed iff its (mtime, path) key is
    * at-or-before the marker. Soundness of the marker rule: a pending
    * non-straggler was, at admission, keyed ABOVE everything discovered
    * before it — in particular above every processed file — so no
    * pending non-straggler can sit at-or-below the max processed key;
    * conversely every processed file is at-or-below it by definition.
    * Pending stragglers are exactly the journal entries with index >=
    * count, and they are re-slotted at their recorded positions among
    * the (key-ordered = admission-ordered) pending non-stragglers, so a
    * replayed uncommitted batch plans exactly the files the original
    * attempt planned and later offsets stay mutually consistent.
    *
    * Runs once per instance; a live query's first offset is count 0
    * (nothing to align). Legacy marker-only offsets classify by marker
    * alone (pre-round-8 behavior); bare-count offsets fall back to
    * assuming the listing's prefix was processed. */
  private def rebase(off: PcapStreamOffset): Unit = synchronized {
    if (!aligned) {
      aligned = true
      if (off.count > 0 || off.stragglers.nonEmpty) {
        refresh()
        val c = off.count
        if (off.last.isEmpty && off.stragglers.isEmpty) {
          // legacy bare count: assume the listing's prefix was processed
          base = math.max(0, c - math.min(tail.length, c))
        } else {
          val jmap = off.stragglers.map(e => e._3 -> e).toMap
          def isProcessed(e: FileEntry): Boolean = jmap.get(e.path) match {
            case Some((idx, _, _)) => idx < c
            case None => off.last.exists { case (m, p) =>
              e.mtime < m || (e.mtime == m && e.path <= p) }
          }
          val (done, pend) = tail.partition(isProcessed)
          // detectable downtime anomaly: if nothing processed can have
          // aged out (every done-classified file is safely above the
          // horizon), the done count must equal the recovered count —
          // an excess means files landed with regressive mtimes while
          // no query ran; they are indistinguishable from processed
          // history and will be skipped (class doc caveat (a))
          if (done.length > c)
            org.slf4j.LoggerFactory.getLogger(getClass).error(
              s"pcap stream: restart found ${done.length} in-window files " +
                s"at-or-below the processed marker but the checkpoint " +
                s"covers only $c — ${done.length - c} file(s) landed with " +
                "regressive mtimes while the query was down and will be " +
                "SKIPPED (a listing cannot place them in discovery order)")
          base = c - done.length
          // reconstruct discovery order across the WHOLE in-window
          // listing, not just the pending side: a replayed uncommitted
          // batch slices positions BELOW the end count, so processed
          // stragglers must also sit at their recorded indices.
          // Journaled entries pin their absolute discovery index; the
          // key-ordered rest (= admission order for non-stragglers)
          // fills the remaining positions ascending from `base`
          val withJ = tail.filter(e => jmap.contains(e.path))
            .sortBy(e => jmap(e.path)._1)
          val noJ = tail.filterNot(e => jmap.contains(e.path))
          val merged = Vector.newBuilder[FileEntry]
          var ji = 0; var ni = 0; var pos = base
          while (ji < withJ.length || ni < noJ.length) {
            if (ji < withJ.length &&
                (ni >= noJ.length || jmap(withJ(ji).path)._1 <= pos)) {
              merged += withJ(ji); ji += 1
            } else { merged += noJ(ni); ni += 1 }
            pos += 1
          }
          tail = merged.result()
          // adopt the journal under this instance's numbering: every
          // in-window journaled entry takes its reconstructed absolute
          // position (processed ones stay below the count, pending ones
          // keep future offsets journaling them); aged-out or
          // externally-removed entries have no reader left and drop
          val newIdx = tail.iterator.zipWithIndex
            .map { case (e, i) => e.path -> (base + i) }.toMap
          val h = horizon
          journal = off.stragglers.iterator.flatMap { case (_, m, p0) =>
            if (m < h) None else newIdx.get(p0).map(i => (i, m, p0))
          }.toVector.sortBy(_._1)
        }
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
    // every offset carries the full in-window straggler journal (both
    // processed and pending entries — a restart needs the pending ones
    // to keep them out of the marker rule, and the processed ones to
    // place them below the count); bounded by the retention window
    PcapStreamOffset(end, best, journal)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val so = start.asInstanceOf[PcapStreamOffset]
    rebase(so) // one-time alignment against a recovered checkpoint
    if (availableNowEnd < 0) refresh() // AvailableNow reads its snapshot
    val s = so.count
    // NOTE: `s` is deliberately NOT treated as committed here. Under
    // default sequential execution it always is, but with asynchronous
    // progress tracking latestOffset can run ahead of durable commits —
    // purging below an uncommitted start could drop entries a restart
    // must replay. Purging is gated strictly on the commit() callback;
    // after a restart it simply resumes at the first new commit.
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
    // the batch END offset: it was created after every admission the
    // batch depends on, so its marker+journal classify the batch's own
    // files correctly, where the START offset may PREDATE a straggler
    // admission the batch contains (its marker rule would misfile those
    // as processed history and derail the count space)
    rebase(end.asInstanceOf[PcapStreamOffset])
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
      keepFrame = need("frame"),
      tcpOptions = need("tcp_mss") || need("tcp_wscale") ||
        need("tcp_sack_ok") || need("tcp_ts_ok"))
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
  * the (mtime, path) of the MAXIMUM processed key — the restart marker
  * that lets a rebuilt listing split into processed vs pending after
  * the in-memory log compacted; `stragglers` is the in-window journal
  * of out-of-order admissions as (absolute discovery index, mtime,
  * path) (see [[PcapMicroBatchStream]] doc).
  *
  * Serialization, newest-first: with a journal, a JSON object
  * `{"v":2,"count":c,"m":mtime,"p":path,"j":[[idx,mtime,path],...]}`
  * (json4s, shipped with Spark); with a marker only, the compact
  * round-7 `count|mtime|path` form (path last so embedded `|` cannot
  * ambiguate); bare `count` otherwise. All three parse, so pre-round-8
  * checkpoints recover unchanged. */
case class PcapStreamOffset(count: Int,
    last: Option[(Long, String)] = None,
    stragglers: Seq[(Int, Long, String)] = Nil) extends Offset {
  override def json(): String =
    if (stragglers.nonEmpty) {
      import org.json4s.JsonDSL._
      import org.json4s.jackson.JsonMethods
      val obj =
        ("v" -> 2) ~ ("count" -> count) ~
        ("m" -> last.map(_._1)) ~ ("p" -> last.map(_._2)) ~
        ("j" -> stragglers.map { case (i, m, p) =>
          org.json4s.JArray(List(
            org.json4s.JInt(i), org.json4s.JInt(m), org.json4s.JString(p)))
        })
      JsonMethods.compact(JsonMethods.render(obj))
    } else last match {
      case Some((m, p)) => s"$count|$m|$p"
      case None         => count.toString
    }
}

object PcapStreamOffset {
  def parse(s: String): PcapStreamOffset = {
    val t = s.trim
    if (t.startsWith("{")) {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val o = JsonMethods.parse(t)
      def num(v: JValue): Long = v match {
        case JInt(i)  => i.toLong
        case JLong(l) => l
        case other => throw new IllegalArgumentException(
          s"bad pcap offset number: $other in $s")
      }
      val count = num(o \ "count").toInt
      val lastOpt = ((o \ "m"), (o \ "p")) match {
        case (m, JString(p)) if m != JNothing && m != JNull =>
          Some((num(m), p))
        case _ => None
      }
      val j = (o \ "j") match {
        case JArray(entries) => entries.map {
          case JArray(List(i, m, JString(p))) => (num(i).toInt, num(m), p)
          case other => throw new IllegalArgumentException(
            s"bad pcap offset journal entry: $other in $s")
        }
        case _ => Nil
      }
      PcapStreamOffset(count, lastOpt, j)
    } else t.split("\\|", 3) match {
      case Array(c)       => PcapStreamOffset(c.toInt)
      case Array(c, m, p) => PcapStreamOffset(c.toInt, Some((m.toLong, p)))
      case _ => throw new IllegalArgumentException(s"bad pcap offset: $s")
    }
  }
}
