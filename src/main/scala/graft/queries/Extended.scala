package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Beyond-parity relational operators (SURVEY §2.1 "not present
  * anywhere" list — out of reference-parity scope but free on Spark,
  * surfaced here so the physical operator coverage includes outer,
  * semi, and anti joins, set union, DISTINCT aggregation, and the
  * scale-technique operators, each under the same DuckDB oracle gate).
  *
  * Physical mapping: x1 → SortMergeJoin LeftOuter, x2 → LeftSemi,
  * x3 → LeftAnti (NOT EXISTS), x4 → Union + hash aggregate, x5 →
  * distinct aggregation (HashAggregate with distinct expansion),
  * x6 → salted shuffle-hash join (hot-key mitigation, spec-pinned
  * physical plan), x7 → as-of join as ONE window pass (join-free
  * plan), x8 → range join as a bin-expanded equi-join (no nested
  * loop), x9 → ROLLUP subtotals (Expand + single hash-agg), x10 →
  * per-partition window analytics (lag + sliding frame, one
  * shuffle), x11 → exact interpolated percentiles (group-local
  * sort; approx_percentile is the sketch path at scale), x14/x15 →
  * INTERSECT/EXCEPT (LeftSemi/LeftAnti + distinct hash-agg), x16 →
  * correlated scalar subquery (de-correlated into a join), x20 →
  * UNION DISTINCT (Union + distinct hash-agg; partial distinct
  * before the exchange).
  */
object Extended {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (spark, sfDir) => Tables.sql(spark, sfDir, q)

  private val x1 =
    """SELECT c.c_mktsegment,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(o.o_orderkey) AS BIGINT) AS n_matched
      |FROM customer c LEFT JOIN orders o
      |  ON c.c_custkey = o.o_custkey
      | AND o.o_orderstatus = 'F'
      |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin

  private val x2 =
    """SELECT count(*) AS cnt FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 100000)""".stripMargin

  private val x3 =
    """SELECT count(*) AS cnt FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey)""".stripMargin

  private val x4 =
    """SELECT status, CAST(count(*) AS BIGINT) AS cnt FROM (
      |  SELECT o_orderstatus AS status FROM orders WHERE o_totalprice > 50000
      |  UNION ALL
      |  SELECT l_linestatus AS status FROM lineitem WHERE l_quantity > 45
      |) GROUP BY status ORDER BY status""".stripMargin

  private val x5 =
    """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
      |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prios
      |FROM orders WHERE o_orderstatus != 'P'""".stripMargin

  private val NumSalts = 8

  // x6: the plain-SQL semantics the salted implementation must equal
  private val x6Sql =
    """SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers
      |FROM supplier s, nation n
      |WHERE s.s_nationkey = n.n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // x7 oracle: correlated max-ts subquery — the declarative as-of
  // semantics. Comparisons and outputs live in the MICROsecond domain
  // on both engines (Spark loads the nanos parquet ts as micros via
  // `ts div 1000`; DuckDB floors the same way with epoch_ns // 1000),
  // so tie semantics are bit-identical.
  private val x7Sql =
    """SELECT event_id, asof_us FROM (
      |  SELECT p.event_id,
      |    (SELECT max(epoch_ns(c.ts) // 1000) FROM events c
      |     WHERE c.user_id = p.user_id AND c.event_type = 'click'
      |       AND epoch_ns(c.ts) // 1000 <= epoch_ns(p.ts) // 1000) AS asof_us
      |  FROM events p
      |  WHERE p.event_type = 'purchase' AND p.user_id IS NOT NULL
      |) WHERE asof_us IS NOT NULL""".stripMargin

  // x8 oracle: the BETWEEN-style range predicate (half-open bands on
  // integer edges)
  private val x8Sql =
    """SELECT band, CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem,
      |  (VALUES ('low', 1, 11), ('mid', 11, 26), ('high', 26, 51)) AS b(band, lo, hi)
      |WHERE l_quantity >= lo AND l_quantity < hi
      |GROUP BY band ORDER BY band""".stripMargin

  // x9: ROLLUP — hierarchical subtotal aggregation (the physical
  // Expand operator: each input row fans out to its grouping sets,
  // then one partial/final hash-agg; ONE corpus shuffle regardless of
  // how many subtotal levels). Grouping-null labels are rewritten via
  // grouping() on both engines so genuine data NULLs could never
  // collide with subtotal rows. Money sums stay DECIMAL-exact until
  // the final DOUBLE cast (driver-hash rule).
  private val x9Sql =
    """SELECT
      |  CASE WHEN grouping(o_orderstatus) = 1 THEN 'ALL'
      |       ELSE o_orderstatus END AS status,
      |  CASE WHEN grouping(o_orderpriority) = 1 THEN 'ALL'
      |       ELSE o_orderpriority END AS prio,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin

  // x10 oracle: per-user event-stream analytics — previous-event
  // delta + 3-row moving average. Frame sums stay in DECIMAL so the
  // sliding-window float association (Spark running-frame vs DuckDB
  // segment tree) cannot skew the hash; division happens once, in
  // DOUBLE, per output row. Timestamps compared in the microsecond
  // domain on both engines. NOTE the domains agree only for
  // POST-EPOCH data: Spark's `ts div 1000` (Tables.scala) truncates
  // toward zero while DuckDB's `//` floors, so a pre-1970 nanosecond
  // timestamp off a 1000 ns boundary would land one microsecond
  // apart. The events table is generated strictly post-epoch, and
  // the ordering key only needs to be consistent per engine — but if
  // this oracle is ever pointed at pre-epoch data, switch the Spark
  // read to floor semantics first.
  private val x10Sql =
    """SELECT event_id,
      |  CAST(v - coalesce(lag(v) OVER w, v) AS DOUBLE) AS delta,
      |  round(CAST(sum(v) OVER f AS DOUBLE) / (count(*) OVER f), 4) AS mavg3
      |FROM (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
      |        CAST(value AS DECIMAL(18,2)) AS v
      |      FROM events WHERE user_id < 100)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id),
      |       f AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin

  // Round-tie caveat (x10 mavg3, x11 p*): Spark's round() on DOUBLE
  // is HALF_UP on the decimal string while DuckDB rounds half away
  // from zero on the binary double — they can differ when a value
  // sits EXACTLY on a .00005 tie. No current value does (ties at 4
  // decimal places require the quotient to be exactly representable,
  // and these quotients/interpolations never are); if a gate ever
  // flakes on a single ulp, align by rounding through DECIMAL on
  // both engines instead.
  // x11 oracle: exact interpolated per-stratum percentiles (DuckDB
  // quantile_cont ≡ Spark percentile: both interpolate at p*(n-1)).
  private val x11Sql =
    """SELECT lang,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  round(quantile_cont(n_chars, 0.25), 4) AS p25,
      |  round(quantile_cont(n_chars, 0.50), 4) AS p50,
      |  round(quantile_cont(n_chars, 0.95), 4) AS p95
      |FROM documents GROUP BY lang""".stripMargin

  // NOTE: must precede `defs` — `sql(x13Sql)` evaluates it eagerly at
  // map construction (unlike the deferred closures), and object vals
  // initialize in declaration order.
  private val x13Sql =
    """SELECT
      |  CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL'
      |       ELSE l_returnflag END AS rflag,
      |  CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL'
      |       ELSE l_linestatus END AS lstatus,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  // x14/x15: set INTERSECT/EXCEPT (distinct semantics both engines);
  // Spark compiles them to LeftSemi/LeftAnti + HashAggregate — the
  // distributed shape is two pruned scans + one key-sized shuffle.
  private val x14Sql =
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nk""".stripMargin

  // customer nations outside region 0 — the subtracted side is a
  // selective dim scan, so the result is NON-EMPTY at every SF (a
  // same-domain EXCEPT like customer-minus-supplier nations goes
  // empty once both cover all 25 nations, making the gate trivial)
  private val x15Sql =
    """SELECT c_nationkey AS nk FROM customer
      |EXCEPT
      |SELECT n_nationkey FROM nation WHERE n_regionkey = 0
      |ORDER BY nk""".stripMargin

  // x16: correlated SCALAR subquery — Catalyst de-correlates it into
  // a join (no per-row re-execution); the comparison is between two
  // STORED doubles, so the gate cannot flake on aggregate association
  // order. A missing customer yields NULL > semantics, filtered
  // identically by both engines.
  private val x16Sql =
    """SELECT count(*) AS cnt FROM orders o
      |WHERE o_totalprice >
      |  (SELECT c_acctbal FROM customer c
      |   WHERE c.c_custkey = o.o_custkey)""".stripMargin

  // x17: FULL OUTER join — the one join-preservation mode x1/x2/x3
  // don't cover. Keyed on custkey with two sides that each hold keys
  // the other lacks AT EVERY SF (BUILDING is a per-customer 1-in-5
  // segment; ~1/3 of custkeys never appear in orders), then rolled
  // up by presence pattern so the gate exercises null-preservation
  // on both sides with a 3-row result. The aggregated right side
  // stays under the broadcast threshold ONLY at toy scale — at
  // 100 TB this is a shuffled full-outer SMJ on the join key, which
  // is the plan local[32] picks too once AQE sees the real sizes.
  private val x17Sql =
    """SELECT CASE WHEN c.c_custkey IS NULL THEN 'orders_only'
      |            WHEN o.custkey IS NULL THEN 'customer_only'
      |            ELSE 'both' END AS side,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(coalesce(o.n_orders, 0)) AS BIGINT) AS orders_total
      |FROM (SELECT c_custkey FROM customer
      |      WHERE c_mktsegment = 'BUILDING') c
      |FULL OUTER JOIN (SELECT o_custkey AS custkey,
      |                   count(*) AS n_orders
      |                 FROM orders GROUP BY o_custkey) o
      |  ON c.c_custkey = o.custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // x18/x19: the approximate aggregates that REPLACE exact
  // distinct/percentile at 100 TB (HLL++ and a rank-error-bounded
  // quantile sketch — both partial-aggregable, so they map-side
  // combine where the exact forms shuffle raw values or sort
  // groups). Gated by a tolerance CONTRACT: Spark emits the exact
  // value plus a 0/1 within-tolerance flag for the sketch; the
  // oracle recomputes the exact value and emits literal 1 — the
  // hash compare fails iff the sketch drifts out of tolerance.
  // Both sketches are deterministic for fixed input (no RNG in
  // HLL++ registers or percentile summaries), so the gate cannot
  // flake.
  // r19 (guide §2.3/§2.4): the former single-level
  // `count(DISTINCT) + approx_count_distinct` form planned the HLL++
  // partial KEYED BY (flag, partkey) — Spark's distinct-agg rewrite
  // evaluates non-distinct aggregates in the first aggregate at
  // distinct-key granularity, so every distinct pair carried a
  // 410-word HLL buffer through the first exchange and the per-pair
  // buffer construction dominated the query (measured 1.66 s median).
  // Pre-distincting moves the HLL to 3-groups granularity: identical
  // values because HLL registers are max-based (duplicate inserts
  // cannot change any register, so the sketch of the distinct set IS
  // the sketch of the multiset) and count(l_partkey) over the
  // distinct pairs is exactly count(DISTINCT l_partkey). Measured
  // 0.58 s median, same rows. The distinct itself partial-aggregates
  // map-side, so the one corpus-sized exchange carries narrow
  // (flag, partkey) pairs — the 100 TB shape.
  private val x18Sql =
    """SELECT l_returnflag,
      |  CAST(count(l_partkey) AS BIGINT) AS exact_cnt,
      |  CAST(abs(approx_count_distinct(l_partkey, 0.02) -
      |           count(l_partkey))
      |       <= 0.05 * count(l_partkey) AS BIGINT) AS approx_ok
      |FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val x19Sql =
    """SELECT l_returnflag,
      |  round(percentile(l_extendedprice, 0.5), 4) AS p50_exact,
      |  CAST(abs(approx_percentile(l_extendedprice, 0.5, 10000) -
      |           percentile(l_extendedprice, 0.5))
      |       <= 0.01 * percentile(l_extendedprice, 0.5) AS BIGINT)
      |    AS approx_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // x20: UNION (DISTINCT) — completes the set-op family: x4 is the
  // bag union (UNION ALL, zero-shuffle concatenation), x14/x15 are
  // INTERSECT/EXCEPT; this is the set union. Physically Union +
  // distinct hash-agg — ONE shuffle on the value, with partial
  // (map-side) distinct before the exchange, so duplicated inputs
  // shrink before they move.
  private val x20Sql =
    """SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
      |UNION
      |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
      |ORDER BY nk""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x20_union_distinct" -> sql(x20Sql),
    "x18_approx_distinct" -> sql(x18Sql),
    "x19_approx_percentile" -> sql(x19Sql),
    "x17_full_outer_join" -> sql(x17Sql),
    "x14_intersect" -> sql(x14Sql),
    "x15_except" -> sql(x15Sql),
    "x16_scalar_subquery" -> sql(x16Sql),
    "x1_left_outer_join" -> sql(x1),
    "x2_semi_join" -> sql(x2),
    "x3_anti_join" -> sql(x3),
    "x4_union_all" -> sql(x4),
    "x5_distinct_agg" -> sql(x5),
    // x6: SKEW SALTING — the fact side joins the dim on a 25-value key
    // (nationkey), the canonical hot-key shuffle: unsalted, at most 25
    // reducers ever do work regardless of cluster size. Salt the fact
    // side with hash(uniform key) mod S and replicate each dim row S
    // times, join on (key, salt) → S× the reduce parallelism, same
    // result. This is the technique for when the dim is TOO BIG to
    // broadcast (here it's hinted to shuffle so the salted path is
    // what actually executes — the spec asserts no broadcast join).
    "x6_salted_skew_join" -> ((spark, sfDir) => {
      val s = Tables.load(spark, sfDir, "supplier")
        .withColumn("salt", pmod(xxhash64(col("s_suppkey")), lit(NumSalts.toLong)))
      val n = Tables.load(spark, sfDir, "nation")
        .withColumn("salt", explode(array((0 until NumSalts).map(i => lit(i.toLong)): _*)))
        .hint("shuffle_hash")
      s.join(n, s("s_nationkey") === n("n_nationkey") &&
          s("salt") === n("salt"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"))
        .orderBy(col("n_name"))
    }),
    // x7: AS-OF JOIN (brief's named custom-operator example) — for
    // each purchase, the latest click by the same user at-or-before
    // the purchase time. NOT a join at all in the physical plan:
    // union-tag both streams, one window pass per user ordered by
    // (ts, kind) carrying the last click time forward, filter back to
    // purchases. ONE shuffle on user_id, state bounded per user — the
    // shape that holds on 100 TB of events, where the naive
    // inequality join is quadratic per user.
    "x7_asof_join" -> ((spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(spark, sfDir, "events")
        // NULL users excluded on BOTH engines: Spark's window would
        // group NULLs into one partition while SQL's correlated
        // equality never matches NULL — latent divergence otherwise
        .filter(col("event_type").isin("click", "purchase") &&
          col("user_id").isNotNull)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          // clicks order BEFORE purchases at equal ts: at-or-before
          when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("is_p"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("asof_us",
          max(when(col("is_p") === 0, col("ts_us"))).over(w))
        // click-attributed purchases only: besides being the natural
        // attribution semantics, this keeps NULL out of the output
        // schema (the driver's hash serializer is representation-
        // sensitive; a nullable BIGINT risks a float round-trip)
        .filter(col("is_p") === 1 && col("asof_us").isNotNull)
        .select(col("event_id"), col("asof_us"))
    }),
    // x8: RANGE JOIN (the brief's other named example) via bin
    // expansion: half-open bands on integer edges explode to one row
    // per unit bin, the fact side joins on floor(value) — a pure
    // equi-join (shuffle/broadcast on the bin key), never the
    // BroadcastNestedLoopJoin Spark would plan for the raw BETWEEN
    // predicate. Expansion factor = band width in bins: bounded and
    // chosen by the binning granularity, independent of fact size.
    "x8_range_join" -> ((spark, sfDir) => {
      import spark.implicits._
      val bands = Seq(("low", 1, 11), ("mid", 11, 26), ("high", 26, 51))
        .toDF("band", "lo", "hi")
        .withColumn("bin", explode(sequence(col("lo"), col("hi") - 1)))
        .select(col("band"), col("bin"))
      Tables.load(spark, sfDir, "lineitem")
        .withColumn("bin", floor(col("l_quantity")).cast("int"))
        .join(bands, "bin")
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
        .orderBy(col("band"))
    }),
    // x9: ROLLUP subtotals — Spark SQL's ROLLUP compiles to Expand +
    // one partial/final HashAggregate (subtotal levels cost fan-out
    // rows, not extra shuffles). Same SQL text as the oracle (x9Sql):
    // both engines parse ANSI ROLLUP identically, and sharing the
    // string means the two sides cannot drift.
    "x9_rollup_agg" -> sql(x9Sql),
    // x10: per-user window analytics (lag delta + 3-row moving
    // average) — ONE shuffle on user_id serves both window specs
    // (same partitioning + ordering); frame arithmetic in DECIMAL,
    // one DOUBLE division per row. The per-user sort is bounded by
    // user history, never corpus-wide — the shape that holds when the
    // events table is 100 TB but no user has more than ~1e6 events.
    "x10_window_analytics" -> ((spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(spark, sfDir, "events")
        .filter(col("user_id") < 100)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("value").cast("decimal(18,2)").as("v"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val f = w.rowsBetween(-2, Window.currentRow)
      ev.select(col("event_id"),
        (col("v") - coalesce(lag(col("v"), 1).over(w), col("v")))
          .cast("double").as("delta"),
        round(sum(col("v")).over(f).cast("double") / count(lit(1)).over(f), 4)
          .as("mavg3"))
    }),
    // x11: exact interpolated percentiles per stratum — the quality-
    // threshold calibration query (e.g. "p95 doc length per language"
    // before setting a filter cutoff). Spark's `percentile` sorts
    // within each group only; at 100 TB swap in approx_percentile
    // (t-digest sketch, partial-aggregable) — same plan shape, the
    // exact form here is what the oracle can check.
    "x11_percentiles" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(expr("percentile(n_chars, 0.25)"), 4).as("p25"),
          round(expr("percentile(n_chars, 0.50)"), 4).as("p50"),
          round(expr("percentile(n_chars, 0.95)"), 4).as("p95"))),
    // x12: pivot — wide per-source language distribution. Spark's
    // pivot with an EXPLICIT value list compiles to one partial/final
    // hash-agg (each cell a conditional count), no extra pass to
    // discover pivot values; na.fill(0) because pivot leaves empty
    // cells null while the oracle's CASE sums yield 0. The explicit
    // list is also the 100 TB discipline: an unlisted pivot triggers
    // a distinct-values collect on the driver.
    "x12_pivot" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "documents")
        .groupBy(col("source"))
        .pivot("lang", PivotLangs)
        .agg(count(lit(1)))
        .na.fill(0, PivotLangs)),
    // x13: CUBE — all 2^d grouping sets in one pass, the other
    // grouping-set shape next to x9's ROLLUP. Physically identical
    // machinery: Expand fans each row to its 4 grouping sets, then
    // ONE partial/final hash-agg — subtotals cost fan-out rows, not
    // extra shuffles. SQL text shared with the oracle (both engines
    // parse ANSI CUBE + grouping()), so the two sides cannot drift.
    "x13_cube" -> sql(x13Sql))

  private val PivotLangs = Seq("de", "en", "es", "fr", "zh")

  private val x12Sql = {
    val cells = PivotLangs.map(l =>
      s"CAST(sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS $l")
      .mkString(",\n  ")
    s"""SELECT source,
       |  $cells
       |FROM documents GROUP BY source""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "x1_left_outer_join" -> x1,
    "x2_semi_join" -> x2,
    "x3_anti_join" -> x3,
    "x4_union_all" -> x4,
    "x5_distinct_agg" -> x5,
    "x6_salted_skew_join" -> x6Sql,
    "x7_asof_join" -> x7Sql,
    "x8_range_join" -> x8Sql,
    "x9_rollup_agg" -> x9Sql,
    "x10_window_analytics" -> x10Sql,
    "x11_percentiles" -> x11Sql,
    "x12_pivot" -> x12Sql,
    "x13_cube" -> x13Sql,
    "x14_intersect" -> x14Sql,
    "x15_except" -> x15Sql,
    "x16_scalar_subquery" -> x16Sql,
    "x17_full_outer_join" -> x17Sql,
    // tolerance-contract oracles: exact value recomputed, literal 1
    // for the within-tolerance flag (see x18Sql note)
    "x18_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_cnt,
        |  CAST(1 AS BIGINT) AS approx_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "x19_approx_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |  CAST(1 AS BIGINT) AS approx_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "x20_union_distinct" -> x20Sql)
}
