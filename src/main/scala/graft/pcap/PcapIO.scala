package graft.pcap

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed entry point: `Dataset[PacketRecord]` (SURVEY.md §1.4 — the
  * decoder core is a plain `Iterator[PacketRecord]`; this lifts it into a
  * typed Dataset for users who want case-class field access and compile-
  * time checks instead of the untyped `pcap` format columns).
  *
  * Stays inside the Dataset API (typed `flatMap` with the product
  * encoder) — one partition per file slice, decode runs on executors.
  */
object PcapIO {

  def packets(spark: SparkSession, path: String,
      options: DecodeOptions = DecodeOptions()): Dataset[PacketRecord] = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val files: Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(path)
      val matches = Option(fs.globStatus(p)).map(_.toSeq).getOrElse {
        if (fs.exists(p)) Seq(fs.getFileStatus(p)) else Seq.empty
      }
      if (matches.isEmpty)
        throw new java.io.FileNotFoundException(s"pcap path does not exist: $path")
      matches.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(_.isFile)
            .filterNot(_.getPath.getName.startsWith("_"))
        else Seq(st)
      }.map(_.getPath.toString)
    }
    val parallelism = math.min(files.length,
      spark.sparkContext.defaultParallelism).max(1)
    spark.createDataset(files)
      .repartition(parallelism)
      .flatMap { file =>
        // executor-side: fresh Hadoop conf (not serializable across the
        // closure); decoder streams the file
        val c = new org.apache.hadoop.conf.Configuration()
        PacketReaders.open(
          graft.sources.pcap.PcapFileOpener.open(c, file), options)
      }
  }
}
