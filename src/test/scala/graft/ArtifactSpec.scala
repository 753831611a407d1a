package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The shared artifact lifecycle (round-10 unification of the ANN-index
  * and graph copies): commit/load roundtrip, and every guard of the
  * staleness rule — fmt, rows, fingerprint — individually rejects. */
class ArtifactSpec extends AnyFunSuite {

  private def key(fmt: Long = 3, rows: Long = 100, fp: Long = 42) =
    Artifact.Key(fmt, rows, fp)

  test("commit then loadIfFresh roundtrips, extra fields survive") {
    val dir = Files.createTempDirectory("artifact_spec")
    import org.json4s.JsonDSL._
    Artifact.commit(dir, "meta.json", key(),
      ("payload" -> Seq("a", "b")))
    val o = Artifact.loadIfFresh(dir, "meta.json", key())
    assert(o.isDefined)
    assert((o.get \ "payload") ==
      org.json4s.JArray(List(
        org.json4s.JString("a"), org.json4s.JString("b"))))
    // no stray tmp file left behind by the atomic move
    assert(!Files.exists(dir.resolve(".meta.json.tmp")))
  }

  test("each staleness guard rejects independently") {
    val dir = Files.createTempDirectory("artifact_spec")
    Artifact.commit(dir, "meta.json", key())
    assert(Artifact.loadIfFresh(dir, "meta.json", key()).isDefined)
    assert(Artifact.loadIfFresh(dir, "meta.json", key(fmt = 4)).isEmpty,
      "format bump must invalidate")
    assert(Artifact.loadIfFresh(dir, "meta.json", key(rows = 101)).isEmpty,
      "row-count drift must invalidate")
    assert(Artifact.loadIfFresh(dir, "meta.json", key(fp = 43)).isEmpty,
      "content-fingerprint drift must invalidate")
  }

  test("absent, corrupt, and pre-fmt sidecars load as None, never throw") {
    val dir = Files.createTempDirectory("artifact_spec")
    assert(Artifact.loadIfFresh(dir, "meta.json", key()).isEmpty)
    Files.write(dir.resolve("meta.json"), "not json{".getBytes("UTF-8"))
    assert(Artifact.loadIfFresh(dir, "meta.json", key()).isEmpty)
    // a sidecar from before the fmt guard (the pre-round-10 graph
    // meta.json shape) must read as stale -> one rebuild, never a
    // silently mis-loaded artifact
    Files.write(dir.resolve("meta.json"),
      """{"rows":100,"fp":42}""".getBytes("UTF-8"))
    assert(Artifact.loadIfFresh(dir, "meta.json", key()).isEmpty)
  }
}
