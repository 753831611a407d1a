package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints physical plans of selected queries for plan-quality review
  * (broadcasts where expected, PushedFilters reaching parquet, codegen). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q03_revenue_by_nation",
        "q22_local_supplier_volume", "dedup_minhash_lsh", "sim_cosine_topk",
        "sim_ann_ivf_seed_baseline", "q34_stream_interval_join_twin",
        "pipeline_pack_sequences", "dedup_bloom_prefilter",
        "pipeline_contamination", "pipeline_domain_mix",
        "sim_kmeans_cluster", "dedup_semantic")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
