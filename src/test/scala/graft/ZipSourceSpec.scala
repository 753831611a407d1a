package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zip.{ZipCentralDirectory, ZipReadStats}

/** The `zip` DSv2 source: clean-room central-directory walk proved
  * against the JDK's INDEPENDENT writer (ZipOutputStream emits
  * streaming local headers with zero sizes + data descriptors — the
  * layout that breaks local-header-trusting readers), census paths
  * reading zero entry bytes, planning-time entry pruning, zip64
  * parsing, and corrupt-entry rejection. */
class ZipSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def content(i: Int, j: Int): Array[Byte] =
    (s"zip $i entry $j " * (1 + (i * 7 + j) % 5)).getBytes("UTF-8")

  /** JDK-written archive: deflate + stored mix, nested dirs. */
  private def writeZip(path: java.nio.file.Path, i: Int, n: Int): Unit = {
    val zo = new java.util.zip.ZipOutputStream(Files.newOutputStream(path))
    try {
      for (j <- 0 until n) {
        val bytes = content(i, j)
        val e = new java.util.zip.ZipEntry(f"docs/e$j%03d.txt")
        if ((i + j) % 3 == 0) {
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

  test("JDK-written archives round-trip: names, sizes, methods, bytes") {
    val dir = Files.createTempDirectory("zip_rt")
    for (i <- 0 until 3) writeZip(dir.resolve(f"ds-$i%03d.zip"), i, 5 + i)
    val rows = spark.read.format("zip").load(dir.toString)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(4), r.getAs[Array[Byte]]("data"))).sortBy(t => (t._1, t._2))
    assert(rows.length == 5 + 6 + 7)
    for ((archive, entry, size, method, data) <- rows) {
      val i = archive.substring(3, 6).toInt
      val j = entry.substring(6, 9).toInt
      val want = content(i, j)
      assert(size == want.length, s"$archive/$entry size")
      assert(method == (if ((i + j) % 3 == 0) "store" else "deflate"))
      assert(java.util.Arrays.equals(data, want), s"$archive/$entry bytes")
    }
  }

  test("census (data pruned) answers from the central directory — " +
      "zero entry bytes read") {
    val dir = Files.createTempDirectory("zip_census")
    writeZip(dir.resolve("big.zip"), 9, 40)
    ZipReadStats.entryBytesRead.reset()
    val agg = spark.read.format("zip").load(dir.toString)
      .selectExpr("entry", "size", "csize", "method")
      .collect()
    assert(agg.length == 40)
    assert(ZipReadStats.entryBytesRead.sum() == 0L,
      s"census read ${ZipReadStats.entryBytesRead.sum()} entry bytes")
    // and the data-bearing scan does read bytes
    spark.read.format("zip").load(dir.toString)
      .selectExpr("md5(data)").collect()
    assert(ZipReadStats.entryBytesRead.sum() > 0L)
  }

  test("pushed entry prefix prunes at planning time") {
    import graft.sources.zip.{ZipInputPartition, ZipScan, ZipScanBuilder}
    val dir = Files.createTempDirectory("zip_prune")
    writeZip(dir.resolve("a.zip"), 2, 30)
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", dir.toString))
    val b = new ZipScanBuilder(opts)
    b.pushFilters(Array(
      org.apache.spark.sql.sources.StringStartsWith("entry", "docs/e00")))
    val parts = b.build().asInstanceOf[ZipScan].toBatch.planInputPartitions()
    val planned = parts.flatMap(_.asInstanceOf[ZipInputPartition].entries)
    assert(planned.length == 10, s"expected e000..e009: ${planned.toSeq}")
    // row-level parity: the residual filter gives the same answer
    import org.apache.spark.sql.functions.col
    val n = spark.read.format("zip").load(dir.toString)
      .filter(col("entry").startsWith("docs/e00")).count()
    assert(n == 10)
  }

  test("zip64: EOCD64 locator/record and 0x0001 extended fields parse") {
    // hand-assemble a tiny archive that uses zip64 structures (the JDK
    // writer only emits them past 4 GiB, so this is built from APPNOTE)
    val name = "big.bin".getBytes("US-ASCII")
    val body = "0123456789".getBytes("US-ASCII")
    val crc = { val c = new java.util.zip.CRC32; c.update(body); c.getValue }
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = (0 until 4).foreach(k => bos.write(((v >> (8 * k)) & 0xFF).toInt))
    def w64(v: Long): Unit = (0 until 8).foreach(k => bos.write(((v >> (8 * k)) & 0xFF).toInt))
    // local header (stored)
    w32(0x04034b50L); w16(45); w16(0); w16(0); w16(0); w16(0)
    w32(crc); w32(body.length.toLong); w32(body.length.toLong)
    w16(name.length); w16(0); bos.write(name); bos.write(body)
    val cdOffset = bos.size()
    // central entry with 0xFFFFFFFF sentinels + zip64 extra
    w32(0x02014b50L); w16(45); w16(45); w16(0); w16(0); w16(0); w16(0)
    w32(crc); w32(0xFFFFFFFFL); w32(0xFFFFFFFFL)
    w16(name.length); w16(28); w16(0); w16(0); w16(0); w32(0)
    w32(0xFFFFFFFFL)                        // local offset sentinel
    bos.write(name)
    w16(0x0001); w16(24)                    // zip64 field: usize csize off
    w64(body.length.toLong); w64(body.length.toLong); w64(0L)
    val cdSize = bos.size() - cdOffset
    // EOCD64 record + locator + EOCD with sentinels
    val eocd64Off = bos.size()
    w32(0x06064b50L); w64(44); w16(45); w16(45); w32(0); w32(0)
    w64(1); w64(1); w64(cdSize.toLong); w64(cdOffset.toLong)
    w32(0x07064b50L); w32(0); w64(eocd64Off.toLong); w32(1)
    w32(0x06054b50L); w16(0); w16(0); w16(0xFFFF); w16(0xFFFF)
    w32(0xFFFFFFFFL); w32(0xFFFFFFFFL); w16(0)
    val dir = Files.createTempDirectory("zip64")
    Files.write(dir.resolve("z64.zip"), bos.toByteArray)
    val rows = spark.read.format("zip").load(dir.toString).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(1) == "big.bin")
    assert(rows(0).getLong(2) == 10L)
    assert(java.util.Arrays.equals(rows(0).getAs[Array[Byte]]("data"), body))
  }

  test("corrupt entries fail loudly: CRC mismatch, truncated deflate, " +
      "not-a-zip") {
    val dir = Files.createTempDirectory("zip_bad")
    val p = dir.resolve("c.zip")
    writeZip(p, 4, 3)
    val bytes = Files.readAllBytes(p)
    // flip one byte inside the first entry's DATA region (local header
    // is 30 bytes + the 13-byte name "docs/e000.txt")
    bytes(45) = (bytes(45) ^ 0x7F).toByte
    Files.write(p, bytes)
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.format("zip").load(dir.toString)
        .selectExpr("md5(data)").collect()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("CRC mismatch") || msg.contains("corrupt") ||
      msg.contains("truncated") || msg.contains("decoded"),
      s"unexpected failure text: $msg")
    val junkDir = Files.createTempDirectory("zip_junk")
    Files.write(junkDir.resolve("x.zip"),
      "definitely not a zip archive at all".getBytes)   // > 22 B: EOCD scan
    val ex2 = intercept[Exception] {
      spark.read.format("zip").load(junkDir.toString).collect()
    }
    def texts(t: Throwable): String =
      if (t == null) "" else t.getMessage + texts(t.getCause)
    assert(texts(ex2).contains("end-of-central-directory"), texts(ex2))
    val shortDir = Files.createTempDirectory("zip_short")
    Files.write(shortDir.resolve("y.zip"), "tiny".getBytes)
    val ex3 = intercept[Exception] {
      spark.read.format("zip").load(shortDir.toString).collect()
    }
    assert(texts(ex3).contains("too short"), texts(ex3))
  }

  test("fuzz: random tails and truncated archives reject cleanly, " +
      "never hang or mis-parse") {
    val dir = Files.createTempDirectory("zip_fuzz")
    val base = dir.resolve("f.zip")
    writeZip(base, 11, 6)
    val bytes = Files.readAllBytes(base)
    val fs = new org.apache.hadoop.fs.Path(base.toString)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    var x = 0x21bDecafL
    def nx(): Int = { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 33).toInt }
    for (trial <- 0 until 120) {
      val p = dir.resolve(s"t$trial.zip")
      val mode = trial % 3
      val buf =
        if (mode == 0) java.util.Arrays.copyOf(bytes,
          23 + math.abs(nx()) % (bytes.length - 23))
        else if (mode == 1) {
          val b = bytes.clone()
          b(math.abs(nx()) % b.length) = nx().toByte
          b
        } else Array.tabulate[Byte](23 + math.abs(nx()) % 400)(_ => nx().toByte)
      Files.write(p, buf)
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(p.toString))
      try {
        val entries = graft.sources.zip.ZipCentralDirectory.read(fs, st)
        // a parse that survives must agree with the JDK if the JDK
        // also accepts it (bit flips outside the CD are legal)
        val in = fs.open(st.getPath)
        try entries.foreach { e =>
          try graft.sources.zip.ZipCentralDirectory.readEntry(in,
            graft.sources.zip.ZipEntrySlice(p.toString, e.name,
              e.localOffset, e.csize, e.usize, e.method, e.crc))
          catch { case _: Exception => () }   // corrupt data: fine, threw
        } finally in.close()
      } catch { case _: IllegalArgumentException | _: java.io.IOException |
        _: IndexOutOfBoundsException | _: NegativeArraySizeException => () }
      Files.delete(p)
    }
  }

  test("the CD walk agrees with the JDK's own ZipFile reader") {
    val dir = Files.createTempDirectory("zip_jdk")
    val p = dir.resolve("j.zip")
    writeZip(p, 7, 12)
    val fs = new org.apache.hadoop.fs.Path(p.toString)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(p.toString))
    val ours = ZipCentralDirectory.read(fs, st)
      .map(e => (e.name, e.usize, e.crc)).sorted
    val zf = new java.util.zip.ZipFile(p.toFile)
    val jdk = try {
      val it = zf.entries()
      val buf = Seq.newBuilder[(String, Long, Long)]
      while (it.hasMoreElements) {
        val e = it.nextElement()
        if (!e.isDirectory) buf += ((e.getName, e.getSize, e.getCrc))
      }
      buf.result().sorted
    } finally zf.close()
    assert(ours == jdk)
  }
}
