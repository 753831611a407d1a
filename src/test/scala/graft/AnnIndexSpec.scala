package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF-PQ index artifact (round-8): a fresh session must
  * probe from the on-disk codes + codebook sidecar instead of
  * re-training and re-encoding the corpus, and a stale artifact (the
  * dataset changed underneath it) must trigger a rebuild, never a
  * silently-wrong probe.
  *
  * The spec drives its own COPY of the sf0.001 embeddings so its
  * per-dataset memo keys and build counters cannot collide with
  * concurrent suites, and clears the in-memory memos between runs —
  * the memos are the only session-scoped index state, so cleared memos
  * + a live artifact IS the fresh-session cold-start (the shared
  * SparkContext itself cannot be restarted mid-suite while other
  * suites run on it). */
class AnnIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def copyDataset(): String = {
    val dir = Files.createTempDirectory("ann_idx_ds")
    val src = Paths.get("/root/testdata/sf0.001/embeddings.parquet")
    // the testdata table is a single parquet file; re-write it as a
    // directory-style table so the stale-guard case can append to it
    val dst = dir.resolve("embeddings.parquet")
    spark.read.parquet(src.toString).write.parquet(dst.toString)
    dir.toString
  }

  private def runIvfpq(d: String): Seq[(Long, Long, Double, Int)] =
    SparkEntry.queries("sim_ann_ivfpq")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted

  test("probe cold-loads the persisted artifact; stale artifact rebuilds") {
    val d = copyDataset()
    val idxBase = Files.createTempDirectory("ann_idx_art").toString
    val prev = spark.conf.getOption("spark.graft.ann.indexDir")
    spark.conf.set("spark.graft.ann.indexDir", idxBase)
    try {
      val sim = graft.operators.Similarity
      val warm = runIvfpq(d)
      assert(warm.nonEmpty)
      assert(sim.buildsFor(d) == 1, "first run trains + persists")
      val idxDir = sim.annIndexDir(spark, d)
      assert(Files.exists(idxDir.resolve("model.json")),
        "codebook sidecar must be persisted")
      assert(Files.exists(idxDir.resolve("codes")),
        "encoded corpus must be persisted as parquet")

      // fresh-session cold start: empty memos, artifact on disk
      sim.clearMemos()
      val cold = runIvfpq(d)
      assert(sim.buildsFor(d) == 1,
        "cold run must load the artifact, not re-train")
      assert(cold == warm, "cold-loaded probe must be bit-identical")

      // stale guard: the dataset grows underneath the artifact -> the
      // recorded row count mismatches -> rebuild (not a wrong probe)
      val extra = spark.range(1).selectExpr(
        "900000L AS vec_id",
        "transform(sequence(1, 64), i -> CAST(i AS FLOAT)) AS embedding")
      extra.write.mode("append").parquet(d + "/embeddings.parquet")
      sim.clearMemos()
      runIvfpq(d)
      assert(sim.buildsFor(d) == 2,
        "a stale artifact (row-count mismatch) must rebuild")

      // regeneration at the SAME cardinality: row counts agree, only
      // the size+mtime fingerprint can see it (round-9)
      val dataFile = Files.list(Paths.get(d + "/embeddings.parquet"))
        .filter(p => p.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.setLastModifiedTime(dataFile,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + 10000))
      sim.clearMemos()
      runIvfpq(d)
      assert(sim.buildsFor(d) == 3,
        "a same-cardinality regeneration must rebuild (fingerprint)")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.ann.indexDir", v)
        case None => spark.conf.unset("spark.graft.ann.indexDir")
      }
      graft.operators.Similarity.clearMemos()
    }
  }
}
