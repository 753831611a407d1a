package graft.tools

import org.apache.spark.sql.SparkSession

/** Timings for the round-4 heavy operators at a given SF (best-of-3 warm
  * runs) — the non-headline counterpart of graft.Bench, recorded in
  * BASELINE.md. */
object R4Bench {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = Seq("pipeline_pagerank", "sim_ann_ivfpq", "dedup_chunk",
      "pipeline_dsir", "pipeline_token_budget", "dedup_simhash_pairs",
      "pipeline_dataset_card", "pipeline_e2e_preprocess")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sf).count() // warm
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$n%-26s $best%.2f s")
    }
    spark.stop()
  }
}
