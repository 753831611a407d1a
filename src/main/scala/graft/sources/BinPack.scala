package graft.sources

/** Whole-file bin-packing shared by the non-splittable sources (pcap,
  * wds, warc): files sorted descending by size, each placed into an
  * open bin by a residual-capacity index — best-fit decreasing via a
  * `TreeMap` ceiling lookup, O(n log n) planning. The greedy
  * `indexWhere` first-fit this replaces was O(n²) when bins rarely
  * close (shards just over half the target): at a million-shard lake
  * that is ~5×10¹¹ driver-side comparisons before the first task
  * launches. Any whole-file assignment is plan-valid (results are
  * partition-invariant), so swapping first-fit for best-fit only
  * changes which task reads which file, never what a query returns.
  */
object BinPack {

  /** Scale-adaptive per-partition byte target, mirroring Spark core's
    * own `FilePartition.maxSplitBytes` formula for file sources:
    * `min(confMax, max(openCost, totalBytes / parallelism))`. With the
    * previous fixed default (filesMaxPartitionBytes = 128 MB) a small
    * lake — the bench fixtures, a dev checkout — bin-packed into ONE
    * partition and every decode serialized on one core (round-17
    * measurement: warc_crawl_pipeline spent 1.8 s of its 1.9 s in a
    * single scan task); at 100 TB `totalBytes / parallelism` is far
    * above 128 MB so the target stays the configured maximum and
    * nothing changes. An explicit `maxBytesPerPartition` option still
    * overrides in all sources. */
  def adaptiveTarget(confMax: Long, openCost: Long, totalBytes: Long,
      parallelism: Int): Long =
    math.min(confMax,
      math.max(openCost, totalBytes / math.max(parallelism, 1)))

  /** Pack `items` (payload, sizeBytes) into bins of at most `maxBytes`
    * counting `openCost` per file; an item larger than the target gets
    * its own bin. Returns the bins' payload lists. */
  def pack[T](items: Seq[(T, Long)], maxBytes: Long,
      openCost: Long): Seq[Seq[T]] = {
    val sorted = items.sortBy(-_._2)
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[T]]
    // residual capacity -> stack of bin indices with exactly that
    // residual (sizes repeat heavily in real lakes, so buckets, not
    // a multimap of distinct keys)
    val byResidual = new java.util.TreeMap[Long, java.util.ArrayDeque[Integer]]
    def push(residual: Long, idx: Int): Unit =
      if (residual > 0) {
        var q = byResidual.get(residual)
        if (q == null) {
          q = new java.util.ArrayDeque[Integer]
          byResidual.put(residual, q)
        }
        q.push(idx)
      }
    sorted.foreach { case (payload, len) =>
      val cost = len + openCost
      val e = byResidual.ceilingEntry(cost)
      if (e == null) {
        bins += scala.collection.mutable.ArrayBuffer(payload)
        push(maxBytes - cost, bins.length - 1)
      } else {
        val q = e.getValue
        val idx = q.pop().intValue()
        if (q.isEmpty) byResidual.remove(e.getKey)
        bins(idx) += payload
        push(e.getKey - cost, idx)
      }
    }
    bins.map(_.toSeq).toSeq
  }
}
