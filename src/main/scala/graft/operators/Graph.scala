package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over a derived co-purchase graph.
  *
  * PageRank is the canonical "iterative joins at scale" workload: each
  * power-iteration step is (ranks ⋈ edges) → aggregate-by-destination.
  * The dedup-cluster connected-components op (`dedup_components`) already
  * exercises iterative min-label propagation; PageRank adds weighted mass
  * exchange with a damping factor — the shape of influence/centrality
  * scoring over web-crawl link graphs in a training-data pipeline
  * (e.g. harmonic/PageRank centrality as a quality prior in Common
  * Crawl-derived corpora).
  *
  * Graph: directed edges between parts that co-occur in an order
  * (both directions, distinct) — so every node has out-degree >= 1 and
  * in-degree >= 1 (the graph is symmetric), which sidesteps dangling-node
  * mass redistribution and keeps the recurrence exactly:
  *
  *   r0(v)   = 1/N
  *   r_k+1(v) = 0.15/N + 0.85 * (sum over u->v of floor(r_k(u)*1e12) div outdeg(u)) / 1e12
  *
  * Cross-engine determinism: the per-edge contribution is floored to a
  * scaled BIGINT before summation, so the aggregation is associative
  * integer addition — Spark's partial/final aggregation order vs DuckDB's
  * sequential order cannot diverge. The remaining double ops
  * (*0.85, +0.15/N, /1e12) are identical single IEEE operations on
  * identical inputs on both sides.
  *
  * Scale (100 TB): edges/out-degrees are computed once, cached, and
  * reused across iterations; each iteration is one shuffle on dst (the
  * rank side is keyed by node = src, so the edge join co-partitions with
  * the previous iteration's output under AQE). Ranks never touch the
  * driver; only the top-20 result does (TakeOrderedAndProject). On a real
  * cluster the edge table would be bucketed by src so every iteration's
  * join is shuffle-free on the edge side.
  */
object Graph {

  private val Scale  = "1000000000000.0" // 1e12, exact in double

  // ----- persisted co-purchase graph artifact (round-8 verdict #3) --------
  // pipeline_pagerank and pipeline_lpa_communities used to rebuild the
  // identical edge list (2.6-5.4 s of their runtime each at sf0.1). Same
  // lifecycle as the IVF-PQ index artifact (Similarity.scala): the
  // WEIGHTED edge relation (src, dst, w = distinct co-occurring orders)
  // is built once, persisted as parquet, and cold-loaded by any later
  // session; a JSON sidecar written LAST via atomic move is the commit
  // marker and records the source row count as the staleness guard
  // (mismatch -> rebuild, never a silently-stale graph). PageRank
  // consumes all edges (w >= 1 is by construction distinct pairs); LPA
  // filters w >= LpaMinW — both as narrow projections of the one cached,
  // src-partitioned relation, so the 25 iteration joins across the two
  // queries reuse a single edge build AND a single partitioning.

  private val edgeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private val edgeBuilds = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()
  private[graft] def buildsFor(d: String): Int =
    Option(edgeBuilds.get(d)).map(_.get).getOrElse(0)
  private[graft] def clearMemos(): Unit = {
    edgeMemo.forEach { (_, df) =>
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist()
    }
    edgeMemo.clear()
    seedMemo.forEach { (_, v) =>
      if (!v._1.sparkSession.sparkContext.isStopped) v._1.unpersist()
    }
    seedMemo.clear()
  }

  /** Persisted-graph format version (1 = distinct-pair weighted edges;
    * 2 = payload-dir list + file inventory + frozen append boundary;
    * 3 = the shared [[graft.DeltaChain]] sidecar layout — the boundary
    * field is now chain-generic); checked by the shared
    * [[graft.Artifact]] staleness rule, so a layout change rebuilds
    * instead of silently mis-loading (a v1/v2 artifact rebuilds once
    * and upgrades). */
  private val GraphFmt = 3L

  /** The persisted edge artifact's delta-chain lifecycle (round 11:
    * the hand-rolled payload-dir machinery moved to the shared
    * [[graft.DeltaChain]], which the LSH dedup bucket index now also
    * rides — one copy of the guards, per the Artifact rationale).
    * Append contract: strict file growth + every delivered l_orderkey
    * ABOVE the build-time max (an order spanning the old/new file
    * split would have pairs partially counted in the base artifact, so
    * the delta self-join would UNDERCOUNT its weight — monotone order
    * keys are the contract, violations force a full rebuild). */
  private val chain = new graft.DeltaChain(
    "spark.graft.graph.dir", "graft_graph", GraphFmt, "edges")

  private[graft] def graphDir(s: SparkSession, d: String): java.nio.file.Path =
    chain.dir(s, d)

  /** Sidecar-recorded payload dirs for `d` (test hook). */
  private[graft] def payloadDirsFor(s: SparkSession, d: String): Seq[String] =
    chain.payloadDirsFor(s, d)

  /** Sidecar-recorded append count for `d` (test hook; -1 = none). */
  private[graft] def appendsFor(s: SparkSession, d: String): Long =
    chain.appendsFor(s, d)

  /** The weighted co-purchase edge relation of a lineitem slice:
    * distinct (order, part) self-join, both directions, counted. Used
    * for the full build (whole table) and the delta (delivery files
    * only — O(delivery), the point of the chain). */
  private def edgeJoin(li: DataFrame): DataFrame = {
    val dl = li.distinct()
    dl.as("a").join(dl.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") =!= col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** The co-purchase edge relation (src, dst, w): memo (warm session) →
    * persisted artifact (cold session — no self-join) → delta append
    * (grown dataset — delivery-only self-join) → full build, all via
    * the shared [[graft.DeltaChain]]. Always returned cached and
    * hash-partitioned on src. The load path merges (src,dst)
    * duplicates across the base + delta payload dirs into one weighted
    * edge: HashPartitioning(src) satisfies the (src,dst) aggregation's
    * distribution, so the merge rides the same single exchange the
    * src-repartition always cost — no extra shuffle, and downstream
    * consumers keep the distinct-pair invariant (pagerank counts each
    * edge once; LPA's w-threshold sees merged weights). */
  private[graft] def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val memo = edgeMemo.get(d)
    if (memo != null && !memo.sparkSession.sparkContext.isStopped)
      return memo
    import s.implicits._
    val tablePath = s"$d/lineitem.parquet"
    // staleness key rows: raw lineitem count (a parquet-metadata count,
    // no shuffle — the distinct-pair count would itself cost the join
    // the artifact exists to avoid)
    val edges = chain.payload(s, d, tablePath,
      rows = Tables.lineitem(s, d).count(),
      build = () => {
        edgeBuilds.computeIfAbsent(d,
          _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
        val e = edgeJoin(Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_partkey"))
        val maxOk = Tables.lineitem(s, d).agg(max($"l_orderkey"))
          .first().getLong(0)
        (e, maxOk)
      },
      delta = (newFiles, boundary) => {
        val delivery = s.read.parquet(newFiles: _*)
          .select($"l_orderkey", $"l_partkey")
        val bounds = delivery.agg(min($"l_orderkey"), max($"l_orderkey"))
          .first()
        if (bounds.isNullAt(0) || bounds.getLong(0) <= boundary) None
        else Some((edgeJoin(delivery), bounds.getLong(1)))
      },
      merge = df => df.groupBy($"src", $"dst").agg(sum($"w").as("w")))
    // sortWithinPartitions(src) before caching: every iterative consumer
    // (pagerank's 20 joins, LPA's 5, the basket/triangle joins) is a
    // sort-merge join on src against this relation. An unsorted cache
    // makes EVERY iteration re-sort the full |E|-row cache inside the
    // join stage (measured round 17: ~0.3-0.8 s of pure sort CPU per
    // iteration stage at sf0.1, the dominant pagerank cost); a cache
    // whose outputOrdering is already src satisfies the SMJ's
    // requiredOrdering, so iterations sort only the |V|-row rank/label
    // side. This is the local-mode twin of "bucket + sort the edge
    // table by src on a real cluster" (guide §2.4/§3).
    val out = edges.repartition($"src")
      .groupBy($"src", $"dst").agg(sum($"w").as("w"))
      .sortWithinPartitions($"src")
      .cache()
    edgeMemo.put(d, out)
    out
  }

  /** Chunked adjacency-list form (src, od, dsts) of a distinct
    * (src, dst) edge relation — the round-17 optimization for the
    * iterative consumers. Rationale (guide §2.3/§2.4, measured): each
    * pagerank/LPA iteration used to re-scan and join the full |E|-row
    * edge cache; the adjacency form groups the cache to ~|V| rows once,
    * so every iteration joins the rank/label table against a |V|-row
    * relation and regenerates the |E| contributions with one codegen
    * explode — measured 6.0 s → 4.2 s for the warm 20-round loop at
    * sf0.1. Scale guard: a hub's neighbor list is NOT one giant row —
    * dsts are split into ceil(od/4096)-way chunks by dst hash
    * (deterministic), so no row exceeds ~a few thousand neighbors at
    * any corpus size; `od` carries the FULL out-degree for the
    * contribution divisor regardless of chunking. Input must be
    * src-partitioned (the artifact cache), so neither the degree
    * aggregation nor the chunk groupBy needs an exchange. */
  private def chunkedAdjacency(e: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val deg = e.groupBy($"src").agg(count(lit(1)).as("od"))
    e.join(deg, "src")
      .groupBy($"src", $"od",
        pmod(xxhash64($"dst"), expr("greatest((od + 4095) div 4096, 1)"))
          .as("chunk"))
      .agg(collect_list($"dst").as("dsts"))
      .select($"src", $"od", $"dsts")
  }

  /** Memoized cached co-purchase adjacency at weight threshold `minW`
    * (1 = the full graph for pagerank, [[LpaMinW]] for LPA) — rides the
    * same per-dataset memo/lifecycle as the edge artifact (keys are
    * suffixed so [[clearMemos]] drops both). */
  private[graft] def coPurchaseAdjacency(s: SparkSession, d: String,
      minW: Long): DataFrame = {
    import s.implicits._
    val key = s"$d#adj$minW"
    val memo = edgeMemo.get(key)
    if (memo != null && !memo.sparkSession.sparkContext.isStopped)
      return memo
    val e0 = coPurchaseEdges(s, d)
    val e = (if (minW > 1) e0.filter($"w" >= minW) else e0)
      .select($"src", $"dst")
    val out = chunkedAdjacency(e).cache()
    edgeMemo.put(key, out)
    out
  }

  /** Memoized (nodes, |V|) of the pagerank graph — the distinct-src
    * relation and its count are invariants of the dataset, so repeated
    * invocations (bench reps, the recall harness) skip the distinct and
    * the count job. Keyed alongside the edge/adjacency memos and
    * dropped by the same [[clearMemos]]. */
  private val seedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, Long)]()
  private def pagerankSeed(s: SparkSession, d: String,
      adj: DataFrame): (DataFrame, Long) = {
    val memo = seedMemo.get(d)
    if (memo != null && !memo._1.sparkSession.sparkContext.isStopped)
      return memo
    import s.implicits._
    val nodes = adj.select($"src").distinct().cache()
    val out = (nodes, nodes.count())
    seedMemo.put(d, out)
    out
  }

  /** Power-iteration depth. 20 is a realistic production depth (the
    * classic 10-50 round regime for ~1e-4 residuals at d=0.85); the
    * DuckDB oracle unrolls the same number of CTE rounds, so code and
    * oracle can never disagree on depth. Round-8 note: this was 3 for
    * rounds 4-7 while the surrounding docs said 20 — the measured cost
    * profile of the honest 20-round loop (edge construction vs
    * iteration jobs) is recorded in BASELINE.md. */
  private val Iters  = 20

  /** LPA rounds: synchronous LPA converges in a handful of sweeps on
    * sparsified co-occurrence graphs (Raghavan et al. report ~5); the
    * oracle unrolls the same depth. */
  private val LpaIters = 5

  /** Minimum co-occurrence weight (distinct orders) for an edge to
    * survive sparsification. */
  private val LpaMinW = 2

  /** Shared oracle CTE prefix: edges, degrees, N, and r0..r3. */
  private lazy val pagerankCtes: String = {
    def iter(k: Int): String = {
      val prev = s"r${k - 1}"
      s"""r$k AS (
        SELECT e.dst AS node,
          CAST(0.15 AS DOUBLE) / n.n
            + CAST(0.85 AS DOUBLE) *
              (CAST(CAST(SUM(CAST(floor(r * $Scale) AS BIGINT) // od)
                    AS BIGINT) AS DOUBLE) / $Scale) AS r
        FROM e
        JOIN $prev p ON p.node = e.src
        JOIN deg ON deg.src = e.src
        CROSS JOIN n
        GROUP BY e.dst, n.n)"""
    }
    s"""li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey),
    deg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT src AS node, CAST(1 AS DOUBLE) / n.n AS r
           FROM deg CROSS JOIN n),
    ${(1 to Iters).map(iter).mkString(",\n")}"""
  }

  /** The synchronous LPA label loop over a symmetric (src, dst) edge
    * relation: label0(v) = v; each round every node takes the most
    * frequent in-neighbor label, ties to the smallest. Returns the
    * final (node, label) relation. Factored out so specs can drive it
    * on constructed graphs (Round8OpsSpec's two-clique separation). */
  private[graft] def labelPropagate(
      e: DataFrame, iters: Int): DataFrame = {
    // per-call adjacency (spec path; the battery query rides the
    // memoized coPurchaseAdjacency instead): safe to unpersist after
    // the loop because the final round is localCheckpoint-materialized
    val adj = chunkedAdjacency(e).cache()
    try labelPropagateAdj(adj, iters)
    finally adj.unpersist()
  }

  /** The LPA loop over a chunked adjacency relation (src, od, dsts):
    * each round joins the |V|-row label table to the |V|-row adjacency
    * and regenerates (dst, label) pairs with one explode — the edge
    * relation is never re-joined (round-17 optimization; see
    * [[chunkedAdjacency]]). */
  private[graft] def labelPropagateAdj(
      adj: DataFrame, iters: Int): DataFrame = {
    import adj.sparkSession.implicits._
    var lab = adj.select($"src".as("node")).distinct()
      .select($"node", $"node".as("label"))
    for (i <- 1 to iters) {
      lab = adj.join(lab, adj("src") === lab("node"))
        .select(explode($"dsts").as("dst"), $"label")
        .groupBy($"dst", $"label")
        .agg(count(lit(1)).as("c"))
        // argmax(count, min label) as a single aggregate: struct
        // comparison is lexicographic, so max((c, -label)) picks
        // the largest count and, among ties, the smallest label
        .groupBy($"dst")
        .agg(max(struct($"c", (-$"label").as("nl"))).as("m"))
        .select($"dst".as("node"), (-$"m.nl").as("label"))
      if (i % 4 == 0 || i == iters) lab = lab.localCheckpoint()
    }
    lab
  }

  val defs: Seq[Q] = Seq(

    Q("pipeline_pagerank",
      (s, d) => {
        import s.implicits._
        // round-17 shape: the 20 iterations run over the memoized
        // chunked ADJACENCY of the shared artifact (see
        // [[chunkedAdjacency]]) — each round joins the |V|-row rank
        // table to the |V|-row adjacency and regenerates the |E|
        // contributions with one codegen explode, instead of re-joining
        // (and re-scanning) the |E|-row edge cache twice per round.
        // `od` rides inside the adjacency row, so the old per-round
        // deg join is gone too. Contributions are the identical
        // floor(r·1e12) div od integers summed per dst — checkpoint/
        // plan placement cannot change them, the oracle is unaffected.
        val adj = coPurchaseAdjacency(s, d, minW = 1L)
        // n and the r0 seed come from the adjacency's src side
        // (distinct across hub chunks); memoized with the artifact so
        // repeated invocations skip the distinct + count
        val (nodes, n) = pagerankSeed(s, d, adj)
        var r = nodes.select($"src".as("node"),
          (lit(1.0) / n.toDouble).as("r"))
        for (i <- 1 to Iters) {
            r = adj.join(r, adj("src") === r("node"))
              .select(explode($"dsts").as("dst"),
                expr(s"cast(floor(r * $Scale) as bigint) div od")
                  .as("contrib"))
              .groupBy($"dst")
              .agg(sum($"contrib").as("m"))
              .select($"dst".as("node"),
                (lit(0.15) / n.toDouble
                  + lit(0.85) * ($"m".cast("double") / lit(1e12))).as("r"))
            // eager localCheckpoint every FOURTH round (and the last):
            // materializing a round costs one driver-synchronized job —
            // the dominant cost of a 20-round loop on anything but huge
            // data — while lineage still truncates before a plan nests
            // more than four join-agg rounds (re-measured round 17:
            // ck4 4.2 s vs ck7 4.6 s vs no-checkpoint 11.0 s — deep
            // AQE replans dominate past ~4). Values are checkpoint-
            // placement-independent (exact integer contrib sums), so
            // the oracle is unaffected.
            if (i % 4 == 0 || i == Iters) r = r.localCheckpoint()
        }
        // adj + nodes stay cached (memoized, dropped via clearMemos)
        r.orderBy(desc("r"), asc("node"))
          .limit(20)
          .select($"node".as("p_partkey"), $"r".as("rank"))
      },
      Some(s"""WITH $pagerankCtes
        SELECT node AS p_partkey, r AS rank
        FROM r$Iters
        ORDER BY r DESC, node LIMIT 20""")),

    // ----- label-propagation communities (synchronous, deterministic) -----
    // Community detection over the co-purchase graph — the second classic
    // iterative-graph workload after PageRank, and the one a crawl
    // pipeline uses to group near-identical site templates / mirror
    // clusters before per-community sampling. Raghavan et al.'s LPA is
    // usually run asynchronously with random tie-breaks; that is
    // non-reproducible run-to-run, which is unacceptable for a corpus
    // pipeline (and untestable against an oracle). This is the
    // deterministic synchronous variant:
    //
    //   label0(v)  = v
    //   label_k+1(v) = argmax over labels L of |{u -> v : label_k(u)=L}|,
    //                  ties broken by SMALLEST label
    //
    // All-integer counts — zero float divergence risk across engines.
    // The dense co-purchase graph collapses to one community under LPA
    // (every popular part neighbors every other), so edges keep only
    // pairs co-occurring in >= LpaMinW distinct orders — the standard
    // "weight-threshold sparsification" that makes LPA meaningful on
    // co-occurrence graphs, and the same move a web-graph pipeline makes
    // when it drops single-link edges.
    //
    // Scale (100 TB): the edge list is computed once, weight-filtered,
    // cached hash-partitioned on src (exactly the pagerank layout), so
    // each of the 5 iterations joins the small label table against a
    // co-partitioned cache with no edge shuffle. The per-iteration state
    // is |V| rows; the (dst,label) count and argmax are two partial-agg
    // shuffles of that small table — max(struct(count, -label)) instead
    // of a rank window, so the argmax is ONE aggregate, not a sort.
    // Checkpoint cadence matches pagerank (every 4th round + last).
    Q("pipeline_lpa_communities",
      (s, d) => {
        import s.implicits._
        // weight-threshold sparsification as a narrow filter over the
        // shared cached src-partitioned artifact, grouped once into the
        // memoized chunked adjacency (round 17; see chunkedAdjacency) —
        // the 5 label rounds never re-join the edge relation
        labelPropagateAdj(coPurchaseAdjacency(s, d, LpaMinW), LpaIters)
          .groupBy($"label".as("community"))
          .agg(count(lit(1)).as("csize"))
          .orderBy(desc("csize"), asc("community"))
          .limit(25)
      },
      Some {
        def it(k: Int): String = s"""l$k AS (
          SELECT dst AS node, label FROM (
            SELECT e.dst, p.label,
              row_number() OVER (PARTITION BY e.dst
                ORDER BY count(*) DESC, p.label ASC) AS rn
            FROM e JOIN l${k - 1} p ON p.node = e.src
            GROUP BY e.dst, p.label) x
          WHERE rn = 1)"""
        s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM lineitem),
          pair AS (
            SELECT a.l_partkey AS src, b.l_partkey AS dst,
                   count(*) AS w
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey <> b.l_partkey
            GROUP BY 1, 2),
          e AS (SELECT src, dst FROM pair WHERE w >= $LpaMinW),
          l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
          ${(1 to LpaIters).map(it).mkString(",\n")}
          SELECT label AS community, count(*) AS csize
          FROM l$LpaIters GROUP BY 1
          ORDER BY csize DESC, community LIMIT 25"""
      }),

    // ----- triangle census + global clustering coefficient ----------------
    // The third classic graph workload after PageRank/LPA: how
    // clustered is the co-purchase graph (triangles, wedges, global
    // transitivity 3T/W). The naive wedge join explodes by the SQUARE
    // of hub degree — the textbook scale-killer on power-law graphs —
    // so edges are oriented by DEGREE ORDER (Schank-Wagner node
    // iterator: each undirected edge points from its lower-(deg,id)
    // endpoint to the higher), which bounds every node's out-degree
    // by ~sqrt(2m) and the wedge volume by Σ O(m·α): a hub's
    // million-edge star contributes ZERO wedges from the hub itself
    // (all its edges point IN). Each triangle is counted exactly once,
    // at its minimum-order vertex. Reuses the persisted co-purchase
    // artifact — cached, src-partitioned, build already paid by
    // pagerank/LPA. All-integer counts; the one division is the final
    // scalar. The oracle replays the identical orientation in DuckDB.
    // ----- association-rule lift (market-basket mining) -------------------
    // The classic basket question over the SAME persisted co-purchase
    // artifact pagerank/LPA/k-core ride: which item pairs co-occur
    // MORE than their popularities predict. lift = N·c12 / (c1·c2),
    // reported as an exact scaled integer (ppm, floor division) so
    // both engines agree bit-for-bit — no float ratio — alongside the
    // raw counts a consumer needs for support/confidence. Scale shape:
    // the expensive self-join is the artifact (built once, delta-
    // appended); item counts are one aggregation on the natural key;
    // the pair-side joins shuffle on item ids; positively-associated
    // rules ranked by TakeOrderedAndProject (top-k, never a global
    // sort).
    // Lift arithmetic: at 100 TB, N and the c1·c2 product both blow
    // past BIGINT (N ~ 10^12 baskets → c1·c2 up to 10^24), so integer
    // ppm scaling — the battery's usual discipline — cannot represent
    // the ratio at the scale this op targets. Instead lift is computed
    // as DOUBLE in ONE FIXED operation order, (w·N)/c1/c2: each step
    // is a single exact-rounded IEEE op (no cross-row accumulation),
    // so both engines produce bit-identical doubles at any magnitude.
    // The raw counts ride along exact.
    Q("pipeline_basket_lift",
      (s, d) => {
        import s.implicits._
        val e = coPurchaseEdges(s, d)
          .filter($"src" < $"dst") // one row per unordered pair
        val li = Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_partkey").distinct()
        val nRel = li.agg(countDistinct($"l_orderkey").as("n"))
        val cnt = li.groupBy($"l_partkey").agg(count(lit(1)).as("c"))
        e.join(cnt.select($"l_partkey".as("src"), $"c".as("c1")), "src")
          .join(cnt.select($"l_partkey".as("dst"), $"c".as("c2")), "dst")
          .crossJoin(broadcast(nRel))
          .select($"src", $"dst", $"w", $"c1", $"c2",
            expr("CAST(w AS DOUBLE) * n / c1 / c2").as("lift"))
          .filter($"lift" > 1.0) // positively associated only
          .orderBy($"lift".desc, $"src".asc, $"dst".asc)
          .limit(20)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM lineitem),
        nn AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM li),
        cnt AS (SELECT l_partkey, COUNT(*) AS c FROM li GROUP BY 1),
        pair AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst,
                 COUNT(*) AS w
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
        r AS (
          SELECT src, dst, CAST(w AS BIGINT) AS w,
            CAST(c1.c AS BIGINT) AS c1, CAST(c2.c AS BIGINT) AS c2,
            CAST(w AS DOUBLE) * nn.n / c1.c / c2.c AS lift
          FROM pair
          JOIN cnt c1 ON c1.l_partkey = src
          JOIN cnt c2 ON c2.l_partkey = dst, nn)
        SELECT src, dst, w, c1, c2, lift
        FROM r WHERE lift > 1.0
        ORDER BY lift DESC, src, dst LIMIT 20""")),

    Q("pipeline_graph_triangles",
      (s, d) => {
        import s.implicits._
        val e = coPurchaseEdges(s, d).select($"src", $"dst")
        // undirected degree (e is symmetric, so src-degree = degree);
        // order key packs (degree, id) into one BIGINT
        val ord = e.groupBy($"src").agg(count(lit(1)).as("dg"))
          .select($"src".as("node"),
            ($"dg" * 4294967296L + $"src").as("ok"))
        val eo = e.filter($"src" < $"dst")
          .join(ord.select($"node".as("src"), $"ok".as("oks")), "src")
          .join(ord.select($"node".as("dst"), $"ok".as("okd")), "dst")
          .select(
            when($"oks" < $"okd", $"src").otherwise($"dst").as("u"),
            when($"oks" < $"okd", $"okd").otherwise($"oks").as("okv"),
            when($"oks" < $"okd", $"dst").otherwise($"src").as("v"))
        val tri = eo.as("e1")
          .join(eo.as("e2"),
            col("e1.u") === col("e2.u") && col("e1.okv") < col("e2.okv"))
          .select(col("e1.v").as("u"), col("e2.v").as("v"))
          .join(eo.select($"u", $"v"), Seq("u", "v"))
          .agg(count(lit(1)).as("n_triangles"))
        val wedges = e.groupBy($"src").agg(count(lit(1)).as("dg"))
          .agg(sum(expr("(dg * (dg - 1)) div 2")).as("n_wedges"))
        tri.crossJoin(wedges)
          .select($"n_triangles", $"n_wedges",
            ($"n_triangles" * lit(3.0) / $"n_wedges").as("global_cc"))
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM lineitem),
        e AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_partkey <> b.l_partkey),
        ord AS (SELECT src AS node,
            COUNT(*) * 4294967296 + src AS ok FROM e GROUP BY src),
        eo AS (
          SELECT CASE WHEN os.ok < od.ok THEN e.src ELSE e.dst END AS u,
            CASE WHEN os.ok < od.ok THEN od.ok ELSE os.ok END AS okv,
            CASE WHEN os.ok < od.ok THEN e.dst ELSE e.src END AS v
          FROM e
          JOIN ord os ON os.node = e.src
          JOIN ord od ON od.node = e.dst
          WHERE e.src < e.dst),
        tri AS (
          SELECT COUNT(*) AS n_triangles
          FROM eo e1
          JOIN eo e2 ON e1.u = e2.u AND e1.okv < e2.okv
          JOIN eo e3 ON e3.u = e1.v AND e3.v = e2.v),
        wg AS (SELECT CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges
               FROM (SELECT COUNT(*) AS dg FROM e GROUP BY src))
        SELECT n_triangles, n_wedges,
          CAST(n_triangles AS DOUBLE) * 3.0 / n_wedges AS global_cc
        FROM tri CROSS JOIN wg""")),

    // ----- k-core decomposition (iterative peeling) -----------------------
    // The dense-subgraph extractor: the 3-core of the THRESHOLDED
    // co-purchase graph (edges kept only where the pair co-occurs in
    // >= 2 orders — the noise floor; the unthresholded graph is so
    // dense its 3-core is the whole graph) is the maximal subgraph
    // where every node keeps degree >= 3 — the standard "strip the
    // fringe, keep the community backbone" preprocessing for graph ML
    // and spam/bot-ring detection. Spark side peels to a TRUE fixpoint
    // (driver loop: degree filter -> endpoint semi-filter, each round
    // ONE shuffle on the edge key, localCheckpoint every 4th round —
    // the connectedComponents discipline; peeling strictly shrinks the
    // edge set so the loop terminates). The oracle UNROLLS the peel as
    // R=16 MATERIALIZED CTE rounds (the pqTrainCtes idiom for
    // iteration in SQL) — the hash match therefore also PROVES the
    // fixpoint is reached within 16 rounds on the battery graph (the
    // sf0.01 peel takes 10), since an unconverged 16th round would
    // differ from Spark's fixpoint.
    Q("pipeline_graph_kcore",
      (s, d) => {
        import s.implicits._
        val K = 3
        // Seed = the shared persisted, delta-appended, src-partitioned
        // co-purchase artifact, thresholded by a narrow filter — the
        // LPA pattern. The self-join is the single most expensive
        // stage in the graph family; the DeltaChain artifact exists so
        // it is paid ONCE per dataset and grown by O(delivery)
        // appends, not rebuilt per query (kcore rebuilt it through
        // round 11 — ~1-2 s of its 3.0 s at sf0.1, dominant at 100 TB).
        //
        // Within the peel, each round reads the edge set THREE times
        // (degree agg + two semi-joins) plus the count action — without
        // a persisted frontier every round would replay from the
        // artifact cache. Eager localCheckpoint per round materializes
        // the frontier ONCE, truncates lineage, and leaves block
        // cleanup to the ContextCleaner when the round's RDD goes
        // unreferenced (no CacheManager entries to leak across
        // invocations).
        var e = coPurchaseEdges(s, d)
          .filter($"w" >= 2)
          .select($"src", $"dst")
          .localCheckpoint()
        var n = e.count()
        var rounds = 0
        var done = false
        while (!done) {
          val keep = e.groupBy($"src").agg(count(lit(1)).as("dg"))
            .filter($"dg" >= K).select($"src".as("node"))
          val pruned = e
            .join(keep.select($"node".as("src")), Seq("src"), "left_semi")
            .join(keep.select($"node".as("dst")), Seq("dst"), "left_semi")
            .select($"src", $"dst")
            .localCheckpoint()
          val n2 = pruned.count()
          if (n2 == n) done = true
          else { e = pruned; n = n2; rounds += 1 }
        }
        e.groupBy($"src").agg(count(lit(1)).as("core_degree"))
          .select($"src".as("node"), $"core_degree")
      },
      Some {
        val K = 3
        // AS MATERIALIZED: each round references the previous edge set
        // THREE times; inlined CTEs would expand 3^16 subtrees
        val rounds = (1 to 16).map { r =>
          s"""n$r AS MATERIALIZED (SELECT src FROM e${r - 1} GROUP BY src
               HAVING COUNT(*) >= $K),
          e$r AS MATERIALIZED (SELECT e.src, e.dst FROM e${r - 1} e
            JOIN n$r a ON a.src = e.src
            JOIN n$r b ON b.src = e.dst)"""
        }.mkString(",\n        ")
        s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM lineitem),
        e0 AS MATERIALIZED (
          SELECT src, dst FROM (
            SELECT a.l_partkey AS src, b.l_partkey AS dst,
              COUNT(*) AS w
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey <> b.l_partkey
            GROUP BY 1, 2)
          WHERE w >= 2),
        $rounds
        SELECT src AS node, COUNT(*) AS core_degree
        FROM e16 GROUP BY src"""
      })
  )
}
