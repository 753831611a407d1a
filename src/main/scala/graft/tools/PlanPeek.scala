package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: A/B iteration shapes for the pagerank loop over the real
  * cached co-purchase adjacency (round-17 wave 2: does forcing SMJ on
  * a sorted adjacency cache beat AQE's per-iteration broadcast of the
  * rank side?). */
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
    val adj = graft.operators.Graph.coPurchaseAdjacency(spark, sfDir, 1L)
    adj.count()
    val adjS = adj.sortWithinPartitions($"src").cache()
    adjS.count()
    val nodes = adj.select($"src").distinct().localCheckpoint()
    val n = nodes.count()
    val r0 = nodes.select($"src".as("node"), (lit(1.0) / n.toDouble).as("r"))
      .localCheckpoint()

    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: min ${ts.min}%.3f  (${ts.map(t => f"$t%.3f").mkString(",")})")
    }

    def iterOf(a: DataFrame, hint: String)(r: DataFrame): DataFrame = {
      val rr = if (hint.isEmpty) r else r.hint(hint)
      a.join(rr, a("src") === rr("node"))
        .select(explode($"dsts").as("dst"),
          expr("cast(floor(r * 1000000000000.0) as bigint) div od").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("m"))
        .select($"dst".as("node"),
          (lit(0.15) / n.toDouble + lit(0.85) * ($"m".cast("double") / lit(1e12))).as("r"))
    }

    def loop(iter: DataFrame => DataFrame, ckptEvery: Int): Unit = {
      var r = r0
      for (i <- 1 to 20) {
        r = iter(r)
        if (i % ckptEvery == 0 || i == 20) r = r.localCheckpoint()
      }
      r.orderBy(desc("r"), asc("node")).limit(20).count()
    }

    time("C  ck4 (wave1)      ")(loop(iterOf(adj, ""), 4))
    time("Cs ck4 sorted+merge ")(loop(iterOf(adjS, "merge"), 4))
    time("Cs ck5 sorted+merge ")(loop(iterOf(adjS, "merge"), 5))
    time("Cb ck4 sorted (AQE) ")(loop(iterOf(adjS, ""), 4))
    time("C  ck5 (wave1)      ")(loop(iterOf(adj, ""), 5))
    spark.stop()
  }
}
