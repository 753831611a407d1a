package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B micro-bench: exact cosine top-k, pair-expression form
  * (broadcast join + codegen VecDot + TopKByScore) vs the blocked
  * partition-local kernel (sim_cosine_topk_blocked). Same bit-identical
  * result; this measures what blocking the query matrix buys. */
object SimKernelBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String): Unit = {
      val q = graft.SparkEntry.queries(name)
      q(spark, sfDir).count() // warm
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s best ${times.min}%.3f s  " +
        f"(${times.map(x => f"$x%.3f").mkString(",")})")
    }
    t("sim_cosine_topk")
    t("sim_cosine_topk_blocked")
    // tiled variant: same kernel over query tiles of 25 — measures the
    // extra corpus passes tiling trades for bounded per-task memory
    def tt(tile: Int): Unit = {
      def run() =
        graft.operators.Similarity.blockedCosineTopK(spark, sfDir,
          tileSize = tile).count()
      run() // warm
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      val label = s"blocked(tile=$tile)"
      println(f"$label%-28s best ${times.min}%.3f s  " +
        f"(${times.map(x => f"$x%.3f").mkString(",")})")
    }
    tt(25)
    spark.stop()
  }
}
