package graft.sources.zip

import java.nio.file.{Files, Path, Paths}

/** ZIP fixture writer — deliberately the JDK's own `ZipOutputStream`,
  * never this repo's code: the reader under test is the clean-room
  * central-directory walk in [[ZipCentralDirectory]], and an
  * independently-written archive (streaming local headers, data
  * descriptors, the JDK's extra fields) is the interop evidence. The
  * content formula is SQL-expressible so the DuckDB oracle re-derives
  * sizes and md5s with `repeat()`. */
object ZipSynth {

  def nEntries(i: Int): Int = 5 + i % 5
  def reps(i: Int, j: Int): Int = 1 + (i * 7 + j) % 5
  def stored(i: Int, j: Int): Boolean = (i + j) % 3 == 0
  def contentString(i: Int, j: Int): String =
    s"zip $i entry $j " * reps(i, j)

  def writeArchive(path: Path, i: Int): Unit = {
    val zo = new java.util.zip.ZipOutputStream(Files.newOutputStream(path))
    try {
      for (j <- 0 until nEntries(i)) {
        val bytes = contentString(i, j).getBytes("UTF-8")
        val e = new java.util.zip.ZipEntry(f"docs/e$j%03d.txt")
        if (stored(i, j)) {
          e.setMethod(java.util.zip.ZipOutputStream.STORED)
          e.setSize(bytes.length.toLong)
          val c = new java.util.zip.CRC32
          c.update(bytes)
          e.setCrc(c.getValue)
        }
        zo.putNextEntry(e)
        zo.write(bytes)
        zo.closeEntry()
      }
    } finally zo.close()
  }

  /** 12 archives, materialized once per synth version (per-file atomic
    * rename, marker last — the WarcSynth fixture discipline). */
  def ensureFixture(dir: String, n: Int = 12): String = {
    val d = Paths.get(dir)
    val marker = d.resolve("_ZIP_FIXTURE_OK_v1_n" + n)
    if (Files.exists(marker)) return dir
    Files.createDirectories(d)
    for (i <- 0 until n) {
      val tmp = d.resolve(f".ds-$i%03d.zip.${ProcessHandle.current().pid()}%d")
      writeArchive(tmp, i)
      Files.move(tmp, d.resolve(f"ds-$i%03d.zip"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    Files.write(marker, Array.empty[Byte])
    dir
  }
}
