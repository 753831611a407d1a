package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: A/B iteration shapes for the pagerank loop over the real
  * cached co-purchase artifact. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = graft.operators.Graph.coPurchaseEdges(spark, sfDir)
      .select($"src", $"dst")
    e.count() // materialize cache
    val deg = e.groupBy($"src").agg(count(lit(1)).as("od"))
      .sortWithinPartitions($"src").cache()
    val n = deg.count()
    val r0 = deg.select($"src".as("node"), (lit(1.0) / n.toDouble).as("r"))
      .localCheckpoint()

    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: min ${ts.min}%.3f  (${ts.map(t => f"$t%.3f").mkString(",")})")
    }

    // A: current shape (e BHJ r BHJ deg -> agg)
    def iterA(r: DataFrame): DataFrame =
      e.join(r, e("src") === r("node"))
        .join(deg, "src")
        .select($"dst",
          expr("cast(floor(r * 1000000000000.0) as bigint) div od").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("m"))
        .select($"dst".as("node"),
          (lit(0.15) / n.toDouble + lit(0.85) * ($"m".cast("double") / lit(1e12))).as("r"))

    // B: pre-divided rank side (rv = r x deg), one BHJ on the big side
    def iterB(r: DataFrame): DataFrame =
      e.join(
          r.join(deg, r("node") === deg("src"))
            .select($"node",
              expr("cast(floor(r * 1000000000000.0) as bigint) div od").as("out")),
          e("src") === col("node"))
        .groupBy($"dst").agg(sum($"out").as("m"))
        .select($"dst".as("node"),
          (lit(0.15) / n.toDouble + lit(0.85) * ($"m".cast("double") / lit(1e12))).as("r"))

    // C: adjacency-array form
    val adj = e.groupBy($"src").agg(collect_list($"dst").as("dsts"),
      count(lit(1)).as("od")).cache()
    adj.count()
    def iterC(r: DataFrame): DataFrame =
      adj.join(r, adj("src") === r("node"))
        .select(explode($"dsts").as("dst"),
          expr("cast(floor(r * 1000000000000.0) as bigint) div od").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("m"))
        .select($"dst".as("node"),
          (lit(0.15) / n.toDouble + lit(0.85) * ($"m".cast("double") / lit(1e12))).as("r"))

    def loop(iter: DataFrame => DataFrame, ckptEvery: Int): Unit = {
      var r = r0
      for (i <- 1 to 20) {
        r = iter(r)
        if (i % ckptEvery == 0 || i == 20) r = r.localCheckpoint()
      }
      r.orderBy(desc("r"), asc("node")).limit(20).count()
    }
    def iterCm(r: DataFrame): DataFrame =
      adj.join(r.hint("merge"), adj("src") === r("node"))
        .select(explode($"dsts").as("dst"),
          expr("cast(floor(r * 1000000000000.0) as bigint) div od").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("m"))
        .select($"dst".as("node"),
          (lit(0.15) / n.toDouble + lit(0.85) * ($"m".cast("double") / lit(1e12))).as("r"))

    time("A  ck4  (current)  ")(loop(iterA, 4))
    time("B  ck4             ")(loop(iterB, 4))
    time("C  ck4             ")(loop(iterC, 4))
    time("C  ck7             ")(loop(iterC, 7))
    time("C  ck21 (no ckpt)  ")(loop(iterC, 21))
    time("Cm ck7 (merge hint)")(loop(iterCm, 7))
    time("A  ck7             ")(loop(iterA, 7))
    time("A  ck21            ")(loop(iterA, 21))
    spark.stop()
  }
}
