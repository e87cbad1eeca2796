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
  * same discipline as dd6's connected-components loop:
  * the edge list and the degree table are built ONCE and persisted
  * (edge build = one distinct over the orders⋈lineitem join, degree
  * = one hash-agg); each iteration is exactly one shuffle — the
  * contribution hash-agg keyed by dst — plus a broadcast-or-SMJ of
  * the rank vector back onto the node table. Iteration count is a
  * constant (3), NOT data-dependent, so the plan is 3 unrolled
  * rounds; at 100 TB the edge list partitions by src once and every
  * round reuses that partitioning, and ranks are localCheckpoint'ed
  * to keep lineage flat (here 3 rounds are shallow enough that the
  * checkpoint is unnecessary). Rank mass is conserved up to the
  * deterministic floor losses, so no normalization pass is needed.
  */
object Graph {

  /** Integer rank scale: rank_0 sums to ~10^12 across the graph. */
  private val Scale = 1000000000000L
  private val Iters = 3

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pr1_pagerank" -> ((spark, sfDir) => {
      val orders = Tables.load(spark, sfDir, "orders")
      val lineitem = Tables.load(spark, sfDir, "lineitem")
      // one distinct (customer, part) edge per purchase relation,
      // symmetrized; the distinct is the only corpus-sized shuffle
      // of the build phase
      val e0 = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("src"),
          (col("l_partkey") * 2 + 1).cast("long").as("dst"))
        .distinct()
      // edges ride WITH the out-degree of their source so each
      // iteration's contribution is a single project + hash-agg
      // (no per-round degree join); persisted — reused 3×
      val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val edges = sym.join(deg, "src").persist()
      val nodes = deg.select(col("src").as("node"), col("outdeg")).persist()
      val n = nodes.count()
      val base = (15L * Scale) / (100L * n)
      var ranks = nodes.select(col("node"), lit(Scale / n).as("rank"))
      for (_ <- 1 to Iters) {
        // name-based join conditions: edges and ranks share deg in
        // their lineage, so dataset-qualified refs would hit Spark's
        // ambiguous-self-join resolution; (src, dst, node) are
        // globally unique names here
        val contribs = edges.join(ranks, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(sum(expr("rank div outdeg")).as("contrib"))
        ranks = nodes.join(contribs, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(base) + expr("85 * coalesce(contrib, 0L) div 100"))
              .cast("long").as("rank"))
      }
      // edges/nodes stay persisted until the caller materializes the
      // returned frame (the 3 unrolled rounds each rescan them);
      // Verify/Bench clear caches between queries
      ranks
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
    "g2_copurchase" ->
      """SELECT l1.l_partkey AS p1, l2.l_partkey AS p2,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem l1 JOIN lineitem l2
        |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        |GROUP BY 1, 2 ORDER BY cnt DESC, p1, p2 LIMIT 25""".stripMargin
  )
}
