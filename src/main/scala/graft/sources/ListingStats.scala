package graft.sources

/** Driver-side counter of data-file directory listings — the test
  * seam pinning "at most one listing per scan build". A directory
  * listing is O(files) RPCs on an object store, so a query that lists
  * 3-4 times (stats estimate, aggregate probe, partition planning)
  * pays the lake's file count several times over; each source
  * memoizes the listing per Scan/ScanBuilder instead. */
object ListingStats {
  val listings = new java.util.concurrent.atomic.LongAdder
}
