package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Graph analytics over the purchase graph — the link-structure
  * ranking verb of a web-scale corpus pipeline (CommonCrawl-style
  * page/host importance ranking feeds crawl prioritization and
  * training-data quality weighting; see e.g. the harmonic-centrality
  * host ranking used by Common Crawl and the PageRank-weighted
  * sampling in web-corpus curation papers).
  *
  * pr1: PageRank over the bipartite customer↔part purchase graph
  * (node = 2·custkey for customers, 2·partkey+1 for parts; an edge
  * per DISTINCT (customer, part) purchase relation, symmetrized so
  * every node has out-degree ≥ 1 — no dangling-mass correction
  * needed). Three damped iterations in EXACT integer arithmetic so
  * the DuckDB oracle reproduces every rank bit-for-bit:
  *
  *   rank_0(v)   = SCALE div n
  *   rank_t+1(v) = (15·SCALE) div (100·n)
  *               + 85 · Σ_{u→v} (rank_t(u) div outdeg(u)) div 100
  *
  * (damping 0.85 as the exact rational 85/100, SCALE = 10^12; div is
  * integral division, identical truncation semantics in Spark's
  * `div` and DuckDB's `//`).
  *
  * Scale shape — the canonical bulk-synchronous iterative workload,
  * same discipline as dd6's connected-components loop: the bare
  * (src, dst) edge list and the degree-bearing node table are built
  * ONCE and persisted (edge build = one distinct over the
  * orders⋈lineitem join + one layout repartition; degree = one
  * hash-agg); each iteration ships the NODE-sized `rank div outdeg`
  * vector to the stationary edge cache (broadcast below the
  * [[BroadcastMaxNodesKey]] threshold, shuffled-hash co-partitioning
  * above it) and runs the dst-keyed contribution hash-agg — the edge
  * list itself is never exchanged after the build. Iteration count
  * is a constant (3), NOT data-dependent, so the plan is 3 unrolled
  * rounds (pr2's data-dependent loop localCheckpoints per round
  * instead). Rank mass is conserved up to the deterministic floor
  * losses, so no normalization pass is needed.
  */
object Graph {

  /** Integer rank scale: rank_0 sums to ~10^12 across the graph. */
  private val Scale = 1000000000000L
  private val Iters = 3
  /** pr2 damping numerator (over 100): 50/100, stronger than pr1's
    * canonical 85/100, so the per-round delta decays ~2× and the
    * DATA-DEPENDENT convergence actually ENGAGES within the round
    * cap at every gate SF — the adaptivity is the tested thing; a
    * production 85/100 run just raises the cap/tolerance. */
  private val ConvDamp = 50L
  /** pr2 round cap — the hard bound on the data-dependent loop. */
  private val ConvMaxRounds = 24
  /** pr2 stops when 1000·Σ|Δrank| ≤ Scale (0.1% of rank mass). */
  private val ConvDenom = 1000L

  /** Shared pr1/pr2 graph build (r18, guide §2.3/§2.4): bare (src,
    * dst) edges + a node table carrying out-degree. The pre-r18 build
    * attached outdeg to every EDGE row via a corpus-sized sym⋈deg
    * sort-merge join (one full exchange + sort of the edge list just
    * to widen it by a column); now outdeg rides on the NODE-sized rank
    * vector instead — each round broadcasts/ships `rank div outdeg`
    * per node, so the edge list is a third narrower, the build join is
    * gone, and the degree table is one hash-agg over the persisted
    * edges. */
  /** @return (edges, nodes, n, broadcastRanks). The edge cache layout
    * follows the shipping mode (measured r18, sf0.1, warm: 0.20 s vs
    * 0.45–0.65 s per round): broadcast mode clusters edges by DST so
    * each round's contribution agg is partition-local up to
    * node-sized partials (the per-round exchange carries ~|V| rows
    * instead of ~|E| poorly-reduced partials); the at-scale fallback
    * clusters by SRC, the shuffled-hash join key. Explicit partition
    * count (defaultParallelism — scales with the cluster, not a
    * local[32] constant) so AQE cannot coalesce the cached layout to
    * a handful of partitions that every round then scans at low
    * parallelism. */
  private def purchaseGraph(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, Long, Boolean) = {
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    // The rank-shipping arm is decided from a cheap UPPER BOUND on the
    // node count — every node is 2·custkey or 2·partkey+1, so
    // n ≤ |customer| + |part| (two parquet-metadata-speed counts) —
    // instead of materializing the graph twice (r18: the former
    // nodes.count-then-edges.count build paid one extra corpus pass
    // just to learn n before choosing the layout). The bound only
    // errs toward the shuffled-hash arm, i.e. conservatively.
    val nUpper = Tables.load(spark, sfDir, "customer").count() +
      Tables.load(spark, sfDir, "part").count()
    val bcast = broadcastRanksFor(spark, nUpper)
    // the distinct is the only corpus-sized shuffle of the build
    // phase; e0 is a build-time scaffold cache (the edge layout and,
    // through it, the degree agg read it once), dropped once edges
    // exist
    val e0 = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_partkey") * 2 + 1).cast("long").as("dst"))
      .distinct().persist()
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val edges = sym.repartition(spark.sparkContext.defaultParallelism,
      col(if (bcast) "dst" else "src")).persist()
    val nodes = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("node"), col("outdeg")).persist()
    val n = nodes.count() // ONE action materializes edges then nodes
    e0.unpersist()
    (edges, nodes, n, bcast)
  }

  /** Per-round rank shipping strategy (guide §3.1): the contribution
    * join's build side is the NODE-sized `rank div outdeg` vector.
    * Below this node count it is broadcast — the corpus-sized edge
    * list is then never exchanged after the build (each round is one
    * cached-edge scan + map-side BHJ + dst-keyed partial agg, and the
    * only per-round shuffle carries node-sized partials). Above it
    * the join falls back to shuffled-hash co-partitioning (build =
    * rank side), the billions-of-nodes shape where a node-sized
    * broadcast stops fitting (~48 B/entry of HashedRelation → the
    * 4M default is ~200 MB, conservative against executor memory;
    * override via spark.graft.pagerank.broadcastMaxNodes). Both arms
    * compute the identical sum. */
  private val BroadcastMaxNodesKey = "spark.graft.pagerank.broadcastMaxNodes"
  private val BroadcastMaxNodesDefault = 4000000L

  /** One damped-PageRank contribution pass over `ranks`
    * (node, outdeg, rank): per-node `rank div outdeg` shipped to the
    * edge list (broadcast or shuffled-hash per [[BroadcastMaxNodesKey]])
    * then the dst-keyed partial/final hash-agg. The per-edge term
    * rank(src) div outdeg(src) is computed once per NODE here instead
    * of once per edge row — same integer value, summed in the same
    * exact arithmetic. */
  private def contribsOf(edges: DataFrame, ranks: DataFrame,
                         broadcastRanks: Boolean): DataFrame = {
    val perSrc = ranks.select(col("node"), expr("rank div outdeg").as("c"))
    val shipped = if (broadcastRanks) broadcast(perSrc)
                  else perSrc.hint("shuffle_hash")
    edges.join(shipped, col("src") === col("node"))
      .groupBy(col("dst"))
      .agg(sum(col("c")).as("contrib"))
  }

  private def broadcastRanksFor(spark: SparkSession, n: Long): Boolean =
    n <= spark.conf.getOption(BroadcastMaxNodesKey)
      .map(_.toLong).getOrElse(BroadcastMaxNodesDefault)

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pr1_pagerank" -> ((spark, sfDir) => {
      val (edges, nodes, n, bcast) = purchaseGraph(spark, sfDir)
      val base = (15L * Scale) / (100L * n)
      var ranks = nodes.select(col("node"), col("outdeg"),
        lit(Scale / n).as("rank"))
      for (_ <- 1 to Iters) {
        // name-based join conditions: edges and ranks share deg in
        // their lineage, so dataset-qualified refs would hit Spark's
        // ambiguous-self-join resolution; (src, dst, node) are
        // globally unique names here
        val contribs = contribsOf(edges, ranks, bcast)
        ranks = nodes.join(contribs, col("node") === col("dst"), "left")
          .select(col("node"), col("outdeg"),
            (lit(base) + expr("85 * coalesce(contrib, 0L) div 100"))
              .cast("long").as("rank"))
      }
      // edges/nodes stay persisted until the caller materializes the
      // returned frame (the 3 unrolled rounds each rescan them);
      // Verify/Bench clear caches between queries
      ranks.select(col("node"), col("rank"))
    }),
    // pr2: UNTIL-CONVERGED PageRank (r13 verdict #7) — the
    // data-dependent sibling of pr1's fixed-3-round gate. Same exact
    // integer arithmetic, damping ConvDamp/100; after each round the
    // driver reads ONE node-sized aggregate (delta = Σ|Δrank|) and
    // stops when ConvDenom·delta ≤ Scale (0.1% of rank mass) or at
    // the ConvMaxRounds hard cap. Each round's ranks are EAGERLY
    // localCheckpoint'ed — dd6's lineage-truncation discipline: a
    // data-dependent loop would otherwise stack an unbounded plan —
    // and the previous round's blocks are freed as soon as the next
    // is materialized. The engaged round count rides in the output
    // (`rounds`), so the STOP DECISION itself is hash-pinned against
    // the oracle's recursive-CTE re-derivation (the dd10 pattern of
    // pinning the adaptive choice, not just the result).
    "pr2_pagerank_converged" -> ((spark, sfDir) => {
      val (edges, nodes, n, bcast) = purchaseGraph(spark, sfDir)
      val base = ((100L - ConvDamp) * Scale) / (100L * n)
      // The SEED stays an EAGER checkpoint: it never gets a direct
      // action of its own (rounds act on `next`), and RDD-level
      // lineage truncation only happens for the first checkpoint-
      // marked node an action's doCheckpoint walk reaches — a lazy
      // seed would stay untruncated and round 1's
      // CheckpointBlocks.free(ranks) would walk through it into the
      // nodes/edges caches and unpersist them mid-loop.
      var ranks = nodes.select(col("node"), col("outdeg"),
        lit(Scale / n).as("rank")).localCheckpoint(true)
      var rounds = 0L
      var delta = Scale // sentinel: strictly above the threshold
      while (ConvDenom * delta > Scale && rounds < ConvMaxRounds) {
        val contribs = contribsOf(edges, ranks, bcast)
        // r18: the new rank AND the previous rank ride in ONE join
        // (ranks is checkpointed, so referencing it on both sides of
        // the round is a cheap block re-scan, not a recompute) — the
        // former separate next⋈ranks delta join per round is gone;
        // delta is a node-sized agg over the checkpointed round
        // output. Identical values: same node universe (ranks = every
        // node, left join keeps all), same |new − old| sum.
        val next = ranks
          .join(contribs, col("node") === col("dst"), "left")
          .select(col("node"), col("outdeg"),
            (lit(base) + expr(s"$ConvDamp * coalesce(contrib, 0L) div 100"))
              .cast("long").as("nrank"),
            col("rank").as("prank"))
          .localCheckpoint(false)
        // the delta agg IS the materializing action for this round's
        // checkpoint blocks (and, in round 1, for the seed vector's)
        delta = next
          .agg(sum(abs(col("nrank") - col("prank"))).as("d"))
          .head().getLong(0)
        // free t-1's checkpoint blocks at the RDD level —
        // Dataset.unpersist is a CacheManager no-op on a
        // localCheckpoint'd frame (its blocks are RDD-level persists)
        graft.engine.CheckpointBlocks.free(ranks)
        ranks = next.select(col("node"), col("outdeg"),
          col("nrank").as("rank"))
        rounds += 1
      }
      ranks.select(col("node"), col("rank"), lit(rounds).as("rounds"))
    }),
    // g2: CO-PURCHASE PAIR MINING (market-basket affinity) — the
    // item-item association verb; in corpus terms, "which entities
    // co-occur in the same container" (parts per order here, but the
    // identical plan mines token-per-document or link-per-page
    // co-occurrence). The self-join is keyed on the CONTAINER
    // (l_orderkey) whose membership is bounded (≤7 items per TPC-H
    // order), so pair fan-out is a constant ≤ C(7,2) per order —
    // linear in order count, never corpus-quadratic; the p1 < p2
    // guard keeps pairs canonical. One equi-join + one hash-agg;
    // top-25 via TakeOrderedAndProject (no global sort). The join is
    // HINTED shuffle-hash: AQE otherwise broadcasts the 600k-row side
    // (measured 2.3–3.6s vs 1.4–1.6s — the broadcast build dominates),
    // and at 100 TB a corpus-sized broadcast is impossible anyway
    // while co-partitioning on the bounded container key is exactly
    // right (per-key hash builds are ≤7 rows, skew-free).
    "g2_copurchase" -> ((spark, sfDir) => {
      val li = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val l2 = li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("p2"))
      li.hint("shuffle_hash")
        .join(l2, col("l_orderkey") === col("ok2") && col("l_partkey") < col("p2"))
        .groupBy(col("l_partkey").as("p1"), col("p2"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("p1"), col("p2"))
        .limit(CoPurchaseTopK)
    })
  )

  /** g2's reported pair count. */
  private val CoPurchaseTopK = 25

  def oracle: Map[String, String] = Map(
    "pr1_pagerank" -> {
      def iter(prev: String, cur: String): String =
        s"""$cur AS (
           |  SELECT d.node,
           |    CAST(${15L * Scale} // (100 * (SELECT n FROM n))
           |      + 85 * COALESCE(s.contrib, 0) // 100 AS BIGINT) AS rank
           |  FROM deg d LEFT JOIN (
           |    SELECT e.dst AS node, SUM(r.rank // e.outdeg) AS contrib
           |    FROM edges e JOIN $prev r ON e.src = r.node
           |    GROUP BY 1) s ON d.node = s.node)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT DISTINCT CAST(2 * o.o_custkey AS BIGINT) AS src,
         |                  CAST(2 * l.l_partkey + 1 AS BIGINT) AS dst
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |sym AS (SELECT src, dst FROM e0
         |        UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
         |        FROM sym GROUP BY 1),
         |edges AS (SELECT s.src, s.dst, d.outdeg
         |          FROM sym s JOIN deg d ON s.src = d.node),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
         |r0 AS (SELECT node, CAST($Scale // (SELECT n FROM n) AS BIGINT) AS rank
         |       FROM deg),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node, rank FROM r3""".stripMargin
    },
    // pr2: the until-converged loop as a RECURSIVE CTE — DuckDB's
    // working table carries (it, node, rank, delta) with delta the
    // window-summed Σ|Δrank| of the round (same value on every row);
    // the recursive term re-derives one integer PageRank round and
    // the WHERE gates recursion on the PREVIOUS round's delta and the
    // hard cap, exactly the Spark driver loop's condition. The final
    // select takes the last materialized round and reports it as
    // `rounds` — the stop decision is part of the hash.
    "pr2_pagerank_converged" ->
      s"""WITH RECURSIVE e0 AS (
         |  SELECT DISTINCT CAST(2 * o.o_custkey AS BIGINT) AS src,
         |                  CAST(2 * l.l_partkey + 1 AS BIGINT) AS dst
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |sym AS (SELECT src, dst FROM e0
         |        UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
         |        FROM sym GROUP BY 1),
         |edges AS (SELECT s.src, s.dst, d.outdeg
         |          FROM sym s JOIN deg d ON s.src = d.node),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
         |pr AS (
         |  SELECT 0 AS it, node,
         |    CAST($Scale // (SELECT n FROM n) AS BIGINT) AS rank,
         |    CAST($Scale AS BIGINT) AS delta
         |  FROM deg
         |  UNION ALL
         |  SELECT p.it + 1, nx.node, nx.new_rank,
         |    SUM(ABS(nx.new_rank - nx.rank)) OVER () AS delta
         |  FROM (
         |    SELECT d.node,
         |      CAST(${(100L - ConvDamp) * Scale} // (100 * (SELECT n FROM n))
         |        + $ConvDamp * COALESCE(s.contrib, 0) // 100 AS BIGINT) AS new_rank,
         |      p0.rank
         |    FROM deg d
         |    LEFT JOIN (SELECT e.dst AS node, SUM(p2.rank // e.outdeg) AS contrib
         |               FROM edges e JOIN pr p2 ON e.src = p2.node
         |               GROUP BY 1) s ON s.node = d.node
         |    JOIN pr p0 ON p0.node = d.node) nx
         |  JOIN pr p ON p.node = nx.node
         |  WHERE p.delta * $ConvDenom > $Scale AND p.it < $ConvMaxRounds)
         |SELECT node, rank,
         |  CAST((SELECT max(it) FROM pr) AS BIGINT) AS rounds
         |FROM pr WHERE it = (SELECT max(it) FROM pr)""".stripMargin,
    "g2_copurchase" ->
      """SELECT l1.l_partkey AS p1, l2.l_partkey AS p2,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem l1 JOIN lineitem l2
        |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        |GROUP BY 1, 2 ORDER BY cnt DESC, p1, p2 LIMIT 25""".stripMargin
  )
}
