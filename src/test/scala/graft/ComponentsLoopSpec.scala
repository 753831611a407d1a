package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The dedup_components iteration discipline (round-6 verdict): every
  * label-propagation round must localCheckpoint (flat plans) and free
  * the superseded round's storage (bounded caching), however many
  * rounds the graph needs. */
class ComponentsLoopSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("random graphs: labels equal a union-find reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 3) {
      val n = 40 + trial * 30
      val edges = (0 until n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min reachable id per node — the loop's documented fixpoint
      val roots = parent.keys.toSeq
        .groupBy(find).flatMap { case (r, members) =>
          val m = math.min(r, members.min)
          (members :+ r).distinct.map(_ -> m)
        }
      val undirected = edges.toDF("src", "dst")
        .union(edges.toDF("dst", "src").select($"src", $"dst"))
      val got = graft.operators.Dedup.connectedComponents(undirected, 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == roots.toMap, s"trial $trial diverged from union-find")
    }
  }

  test("components loop: flat final plan, <=2 label sets cached mid-loop") {
    import spark.implicits._
    // a 12-node chain (0-1-...-11) + an isolated pair: min-label needs
    // 11 propagation rounds to drag 0 to the far end, +1 to detect the
    // fixpoint — a genuinely iterative case, well past one checkpoint
    val chain = (0L until 11L).map(i => (i, i + 1)) :+ ((100L, 101L))
    val edges = chain.toDF("src", "dst")
      .union(chain.toDF("dst", "src").select($"src", $"dst"))
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.keySet.toSet
    var maxExtra = 0
    var rounds = 0
    val labels = graft.operators.Dedup.connectedComponents(edges,
      onIteration = { i =>
        rounds = i
        val extra = (sc.getPersistentRDDs.keySet.toSet -- baseline).size
        maxExtra = math.max(maxExtra, extra)
      })
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rounds >= 12, s"chain must take many rounds, took $rounds")
    // correctness: the whole chain collapses to 0, the pair to 100
    (0L to 11L).foreach(i => assert(got(i) == 0L))
    assert(got(100L) == 100L && got(101L) == 100L)
    // storage bound: superseded checkpoints are freed every round, so
    // the loop never holds more than current + in-flight label sets
    assert(maxExtra <= 2,
      s"loop retained $maxExtra checkpointed label sets (want <=2)")
    // lineage bound: the result is a scan of the last checkpoint, not a
    // 12-deep join tree — no Join survives in the physical plan
    val plan = labels.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"final plan must be flat:\n$plan")
  }
}
