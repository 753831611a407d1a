package graft.sources

import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The one decoder for DSv2 path options, shared by the pcap and wds
  * sources: Spark encodes `load(paths*)` as a JSON string array in the
  * "paths" option, so it must be parsed as real JSON (paths may
  * contain commas or quotes, which a split-on-comma would corrupt);
  * the singular "path" option is appended verbatim. */
object PathOptions {

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def paths(options: CaseInsensitiveStringMap, source: String)
      : Seq[String] = {
    val multi = Option(options.get("paths")).map { json =>
      val node = try mapper.readTree(json) catch {
        case e: Exception => throw new IllegalArgumentException(
          s"$source 'paths' option is not valid JSON: $json", e)
      }
      if (!node.isArray) throw new IllegalArgumentException(
        s"$source 'paths' option must be a JSON array of strings: $json")
      (0 until node.size).map(node.get(_).asText()).filter(_.nonEmpty)
    }.getOrElse(Seq.empty)
    val single = Option(options.get("path")).toSeq
    (multi ++ single).distinct
  }
}
