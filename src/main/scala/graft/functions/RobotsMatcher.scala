package graft.functions

/** RFC 9309 (Robots Exclusion Protocol) rule matching — the
  * production-crawl-hygiene semantics: among ALL rules whose pattern
  * matches the path, the one with the longest pattern wins, and on a
  * length tie the least-restrictive (Allow) rule wins (§2.2.2).
  * Patterns anchor at the path start, `*` matches any character
  * sequence, a trailing `$` anchors the pattern at the path end. A
  * path no rule matches is allowed.
  *
  * This is deliberately a tiny pure object (not a Catalyst
  * expression): the robots operator evaluates it through a scalar UDF
  * over a broadcast rules column — per-row work is a handful of
  * sub-microsecond glob checks against a site's few rules, nowhere
  * near the codegen-boundary cost that matters at scale. */
object RobotsMatcher extends Serializable {

  /** Does `pattern` match `path` per RFC 9309? Anchored at the path
    * start; `*` = any sequence; trailing `$` = end anchor; otherwise
    * a prefix match. Empty patterns match nothing (an empty
    * `Disallow:` line means "no restriction"). */
  def matches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1)
      else pattern
    // iterative segment matcher: literal runs between '*'s must appear
    // in order; the first run anchors at 0; with '$' the last run must
    // end the path. Linear in |path| per segment (indexOf scan), no
    // exponential backtracking — '*' is "skip to the NEXT occurrence",
    // which is complete for this grammar because later occurrences
    // only shrink the room for the remaining segments... except for
    // the final anchored segment, which must instead match at the END.
    val segs = pat.split("\\*", -1)
    var s = 0
    var first = true
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      val lastSeg = i == segs.length - 1
      if (first) {
        if (!path.startsWith(seg)) return false
        s = seg.length
        first = false
      } else if (lastSeg && anchored) {
        // the final segment must END the path, at or after s
        return path.length - s >= seg.length && path.endsWith(seg)
      } else {
        val at = path.indexOf(seg, s)
        if (at < 0) return false
        s = at + seg.length
      }
      i += 1
    }
    if (anchored) s == path.length else true
  }

  /** Longest-match verdict over (allow, pattern) rules for one group:
    * true = fetching/using `path` is allowed. No matching rule =
    * allowed; longest matched pattern wins; Allow wins length ties. */
  def allowed(rules: Seq[(Boolean, String)], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { case (allow, pattern) =>
      if (matches(pattern, path)) {
        val len = pattern.length
        if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
          bestLen = len
          bestAllow = allow
        }
      }
    }
    bestAllow
  }
}
