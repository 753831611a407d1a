package graft

import org.apache.spark.sql.SparkSession

/** Shared lifecycle for persisted offline artifacts (the ANN index, the
  * co-purchase graph): one place owning the addressing, the commit
  * protocol, and the staleness rule, so the guards cannot diverge
  * between artifact kinds again (round-9 advisory: the two hand-rolled
  * copies had each evolved a guard the other lacked).
  *
  * Protocol:
  *   - the artifact lives in a content-addressed dir (md5 of the dataset
  *     path under a configurable base);
  *   - the BIG payload (parquet) is written first by the caller; the
  *     small JSON sidecar is written LAST via atomic move — its presence
  *     commits the whole artifact (a crash mid-write leaves no sidecar,
  *     so the next session rebuilds rather than half-loads);
  *   - staleness = ALL of: format version (layout/semantics changes
  *     rebuild rather than silently mis-load), source row count, and the
  *     source content fingerprint ([[Tables.fingerprint]]: sizes+mtimes,
  *     which catches a dataset REGENERATED at the same cardinality);
  *   - any parse failure or mismatch loads as None — never a throw, the
  *     artifact is a cache, the build path is always a valid fallback.
  */
object Artifact {

  /** The full staleness key stored in (and checked against) the sidecar. */
  final case class Key(fmt: Long, rows: Long, fp: Long)

  /** Content-addressed artifact directory: `conf(confKey)` (or
    * java.io.tmpdir/defaultSubdir) / md5(dataset path). */
  def dir(s: SparkSession, confKey: String, defaultSubdir: String,
      dataset: String): java.nio.file.Path = {
    val base = s.conf.get(confKey,
      sys.props("java.io.tmpdir") + "/" + defaultSubdir)
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dataset.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.nio.file.Paths.get(base, h)
  }

  def asLong(v: org.json4s.JValue): Long = v match {
    case org.json4s.JInt(i) => i.toLong
    case org.json4s.JLong(l) => l
    case _ => -1L
  }

  /** The committed sidecar's JSON if present, parseable, and fresh under
    * `key`; None otherwise (absent, corrupt, or any guard mismatch). The
    * returned JValue carries the caller's extra fields (model payload). */
  def loadIfFresh(dir: java.nio.file.Path, sidecar: String,
      key: Key): Option[org.json4s.JValue] = {
    val marker = dir.resolve(sidecar)
    if (!java.nio.file.Files.exists(marker)) return None
    try {
      val o = org.json4s.jackson.JsonMethods.parse(new String(
        java.nio.file.Files.readAllBytes(marker), "UTF-8"))
      if (asLong(o \ "fmt") != key.fmt) return None
      if (asLong(o \ "rows") != key.rows) return None
      if (asLong(o \ "fp") != key.fp) return None
      Some(o)
    } catch { case _: Exception => None }
  }

  /** Commit the artifact: write the key + extra fields as the sidecar
    * via atomic move. The caller must have finished writing all payload
    * files under `dir` BEFORE calling this. */
  def commit(dir: java.nio.file.Path, sidecar: String, key: Key,
      extra: org.json4s.JsonAST.JObject = org.json4s.JsonAST.JObject())
      : Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val obj = (("fmt" -> key.fmt) ~ ("rows" -> key.rows) ~
      ("fp" -> key.fp)) merge extra
    java.nio.file.Files.createDirectories(dir)
    val tmp = dir.resolve("." + sidecar + ".tmp")
    java.nio.file.Files.write(tmp,
      JsonMethods.compact(JsonMethods.render(obj)).getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, dir.resolve(sidecar),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
