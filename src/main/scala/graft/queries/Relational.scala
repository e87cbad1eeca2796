package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Relational operator surface — SURVEY.md §2.1 (S1,S2,P1,F1–F8,J1,
  * A1–A3,O1,O2) mapped from the reference's STATS/JOB workload shapes.
  * J2 (physical join-variant steering) lives in [[JoinVariants]] and
  * `planopt.Candidates`; J3 (Hash/Materialize) is implicit in Spark's
  * HashedRelation build sides.
  * (ref: `/root/reference/data/test/stats_test_sql.txt`,
  * `imdb_test_sql.txt`, generators `create_sql.py`,
  * `generate_stats_sql.py`, `generate_imdb_sql.py`) onto the testdata
  * star schema.
  *
  * Join-heavy queries use the reference's native comma-FROM SQL syntax
  * through `spark.sql` — Spark's parser + Catalyst (`ReorderJoin`,
  * `PushPredicateThroughJoin`) recover the inner equi-joins, which is
  * exactly the built-in machinery the reference leans on PostgreSQL
  * for. Single-table / ordering shapes use the DataFrame API.
  *
  * Determinism: every query either aggregates to a small result or
  * sorts by a unique key — required for the DuckDB hash compare.
  * Money sums are computed in DECIMAL on both sides (double sums are
  * association-order dependent and would hash-mismatch).
  *
  * Scale notes (100 TB): all aggregates are hash-aggregates with
  * map-side partial combine; joins on *key columns* shuffle-hash/SMJ
  * with filters pushed below the join by Catalyst; `nation`/`region`
  * are bounded-size dims and always broadcast. No driver-side
  * collection anywhere.
  */
object Relational {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (spark, sfDir) => Tables.sql(spark, sfDir, q)

  // --- S1/A1: full scan + COUNT(*) (STATS workload's universal shape) ---
  private val s1 = "SELECT count(*) AS cnt FROM lineitem"

  // --- F1: numeric comparisons = != > < >= <= (ref create_sql.py:213) ---
  private val f1 =
    """SELECT count(*) AS cnt FROM lineitem
      |WHERE l_quantity >= 10 AND l_quantity <= 40 AND l_discount > 0.02
      |  AND l_discount < 0.09 AND l_linenumber = 2 AND l_suppkey != 7""".stripMargin

  // --- F2: string =/!= (ref generate_stats_sql.py:192-194) ---
  private val f2 =
    """SELECT count(*) AS cnt FROM orders
      |WHERE o_orderstatus = 'F' AND o_orderpriority != '5-LOW'""".stripMargin

  // --- F3: LIKE '%xx%' (ref generate_imdb_sql.py:266-271) ---
  private val f3 =
    """SELECT count(*) AS cnt FROM part
      |WHERE p_name LIKE '%red%' AND p_type LIKE 'PROMO%'""".stripMargin

  // --- F4: IN (2-7 values) (ref generate_imdb_sql.py:255-265) ---
  private val f4 =
    """SELECT count(*) AS cnt FROM customer
      |WHERE c_mktsegment IN ('BUILDING','MACHINERY','AUTOMOBILE')
      |  AND c_nationkey IN (1,3,5,7,11,13,17)""".stripMargin

  // --- F5: BETWEEN (ref imdb_test_sql.txt:4) ---
  private val f5 =
    """SELECT count(*) AS cnt FROM lineitem
      |WHERE l_quantity BETWEEN 5 AND 15
      |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                     AND TIMESTAMP '1998-06-30 00:00:00'""".stripMargin

  // --- F6: IS NULL / IS NOT NULL (ref sql_template.py:93-105); testdata
  //     has no physical nulls so NULLIF manufactures them ---
  private val f6 =
    """SELECT count(*) AS cnt FROM orders
      |WHERE NULLIF(o_orderstatus, 'P') IS NOT NULL
      |  AND NULLIF(o_orderpriority, '1-URGENT') IS NULL""".stripMargin

  // --- F7: OR disjunction as one filter unit (ref pg.py:296-298) ---
  private val f7 =
    """SELECT count(*) AS cnt FROM lineitem
      |WHERE (l_returnflag = 'A' OR l_linestatus = 'O')
      |  AND (l_quantity < 10 OR l_quantity > 45)""".stripMargin

  // --- F8: timestamp literals (ref stats_test_sql.txt:2) ---
  private val f8 =
    """SELECT count(*) AS cnt FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '2000-06-01 00:00:00'""".stripMargin

  // --- J1: 2-way comma-FROM equi-join (STATS q2 shape:
  //     `stats_test_sql.txt:2` COUNT over comments⋈badges + filters) ---
  private val j2way =
    """SELECT count(*) AS cnt FROM orders o, customer c
      |WHERE o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate <= TIMESTAMP '1998-01-01 00:00:00'""".stripMargin

  // --- J1: 5-way connected join (STATS 5-way star,
  //     `stats_train_sql.txt:5` shape) ---
  private val j5way =
    """SELECT count(*) AS cnt
      |FROM lineitem l, orders o, customer c, supplier s, nation n
      |WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
      |  AND l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
      |  AND c.c_acctbal > 0 AND l.l_quantity < 30
      |  AND o.o_orderstatus != 'P'""".stripMargin

  // --- J1: widest connected join over the whole schema (JOB queries
  //     reach 17 tables; our schema tops out at 7 relational tables) ---
  private val j7way =
    """SELECT count(*) AS cnt
      |FROM lineitem l, orders o, customer c, supplier s, nation n,
      |     region r, part p
      |WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
      |  AND l.l_suppkey = s.s_suppkey AND l.l_partkey = p.p_partkey
      |  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      |  AND r.r_name = 'ASIA' AND p.p_size BETWEEN 1 AND 25
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'""".stripMargin

  // --- J1: 10-way connected join over the FULL testdata schema —
  //     the reference's join tail reaches 17 tables
  //     (`create_sql.py:274-323` samples connected subgraphs up to the
  //     whole 21-node JOB graph); this pins CBO/AQE behavior at our
  //     schema's upper tail, where join-order search space actually
  //     stresses the learned chooser. The graph extends the 7-way
  //     relational chain with the pipeline tables: events joins
  //     customer on user_id (FK-ish: user ids ⊂ custkeys), documents
  //     joins events on doc_id = user_id (author link), embeddings
  //     joins documents 1:1 on vec_id = doc_id. One filter per
  //     pipeline table keeps the count bounded (~16k rows at sf0.1). ---
  private val j10way =
    """SELECT count(*) AS cnt
      |FROM lineitem l, orders o, customer c, supplier s, nation n,
      |     region r, part p, events e, documents d, embeddings v
      |WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
      |  AND l.l_suppkey = s.s_suppkey AND l.l_partkey = p.p_partkey
      |  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      |  AND e.user_id = c.c_custkey AND d.doc_id = e.user_id
      |  AND v.vec_id = d.doc_id
      |  AND e.event_type = 'purchase' AND l.l_quantity < 10
      |  AND o.o_orderstatus = 'F' AND p.p_size BETWEEN 1 AND 40
      |  AND d.lang = 'en' AND v.label < 8""".stripMargin

  // --- J1: MULTI-ALIAS join — the same table joined twice under two
  //     aliases (supplier nation vs customer nation), the IMDB/JOB
  //     workload's defining shape (ref `generate_imdb_sql.py`'s
  //     multi-alias phase samples repeated-table subgraphs; classic
  //     TPC-H Q7 volume-shipping form). The disjunctive cross-alias
  //     predicate can only sit above BOTH nation joins — exactly the
  //     placement problem a join-order search must respect. DECIMAL
  //     volume sum with a final double cast (the q1/q2 discipline). ---
  private val jAlias =
    """SELECT count(*) AS cnt,
      |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4)) *
      |    (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
      |    AS DECIMAL(18,4))) AS DOUBLE) AS volume
      |FROM supplier s, lineitem l, orders o, customer c,
      |     nation n1, nation n2
      |WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
      |  AND c.c_custkey = o.o_custkey AND s.s_nationkey = n1.n_nationkey
      |  AND c.c_nationkey = n2.n_nationkey
      |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'""".stripMargin

  // --- J1: 17-RELATION connected join — the reference's measured
  //     join-size MAXIMUM (JOB queries reach 17 relations via repeated
  //     aliases of the same table; `create_sql.py:274-323` BFS-samples
  //     connected subgraphs up to the full 21-node graph). Our schema
  //     has 10 distinct tables, so the tail past 10 is built exactly
  //     the way JOB builds it: ALIAS REPEATS, each attached by a real
  //     key edge. All seven extra relations are lookup or 1:1 edges
  //     (customer-side nation/region chain, a second supplier lookup
  //     from lineitem with its own nation, the event user re-resolved
  //     as c2, and the 1:1 doc<->vec link walked in both directions),
  //     so the only fan-out in the whole query is the j10way core —
  //     output stays ~j10way-sized and the planner faces a 17-node
  //     join-order space with 11 broadcastable dims. The cross-alias
  //     disjunction (supplier region vs customer region, or a small
  //     customer-nation set) can only be placed above BOTH region
  //     joins — the same placement constraint jAlias pins, now at
  //     depth 17. ---
  private val j17rel =
    """SELECT count(*) AS cnt
      |FROM lineitem l, orders o, customer c, supplier s, nation n1,
      |     region r1, part p, events e, documents d, embeddings v,
      |     nation n2, region r2, supplier s2, nation n3, customer c2,
      |     documents d2, embeddings v2
      |WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
      |  AND l.l_suppkey = s.s_suppkey AND l.l_partkey = p.p_partkey
      |  AND s.s_nationkey = n1.n_nationkey
      |  AND n1.n_regionkey = r1.r_regionkey
      |  AND e.user_id = c.c_custkey AND d.doc_id = e.user_id
      |  AND v.vec_id = d.doc_id
      |  AND c.c_nationkey = n2.n_nationkey
      |  AND n2.n_regionkey = r2.r_regionkey
      |  AND l.l_suppkey = s2.s_suppkey
      |  AND s2.s_nationkey = n3.n_nationkey
      |  AND c2.c_custkey = e.user_id
      |  AND d2.doc_id = v.vec_id AND v2.vec_id = d.doc_id
      |  AND e.event_type = 'purchase' AND l.l_quantity < 10
      |  AND o.o_orderstatus = 'F' AND p.p_size BETWEEN 1 AND 40
      |  AND d.lang = 'en' AND v.label < 8
      |  AND s2.s_acctbal > 0 AND c2.c_acctbal > 0
      |  AND d2.n_chars > 0 AND v2.label >= 0
      |  AND (r1.r_name != r2.r_name OR n2.n_nationkey IN (1,2,3))""".stripMargin

  // --- A2: MIN(col) AS alias ×3 (JOB shape, `imdb_test_sql.txt:1`) ---
  private val aMin =
    """SELECT min(p.p_name) AS min_pname, min(s.s_name) AS min_sname,
      |       min(o.o_totalprice) AS min_price
      |FROM part p, lineitem l, supplier s, orders o
      |WHERE l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
      |  AND l.l_orderkey = o.o_orderkey AND p.p_name LIKE '%blue%'
      |  AND p.p_size BETWEEN 5 AND 25
      |  AND s.s_nationkey IN (0,2,4,6,8,10,12)""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_full_scan_count" -> sql(s1),
    // S2: selective access = scan + pushed parquet filters (the Spark
    // analog of PG Index/Bitmap scans, SURVEY §2.1 S2)
    "s2_selective_scan" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "lineitem")
        .filter(col("l_quantity") < 5 && col("l_discount") >= 0.05)
        .agg(count(lit(1)).as("cnt"))),
    // P1: projection, no aggregate (ref stats_test_sql.txt:1). No ORDER
    // BY: the reference's P1 has none, the compare harness sorts rows
    // before hashing, and an unbounded global sort is exactly the shape
    // that breaks at 100 TB (full range-shuffle of every matching row).
    "p1_projection" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey"), col("o_totalprice"))),
    "f1_numeric_cmp" -> sql(f1),
    "f2_string_eq" -> sql(f2),
    "f3_like" -> sql(f3),
    "f4_in" -> sql(f4),
    "f5_between" -> sql(f5),
    "f6_null" -> sql(f6),
    "f7_or" -> sql(f7),
    "f8_timestamp" -> sql(f8),
    "j1_join_2way" -> sql(j2way),
    "j1_join_5way" -> sql(j5way),
    "j1_join_7way" -> sql(j7way),
    "j1_join_10way" -> sql(j10way),
    "j1_join_alias" -> sql(jAlias),
    "j1_join_17rel" -> sql(j17rel),
    "a2_min_join" -> sql(aMin),
    // O1: explicit sort (physical SortExec; ref has Sort only under
    // MergeJoin — we surface it as deterministic top-k)
    "o1_sort" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),
    // O2: limit (GlobalLimitExec) after a deterministic order
    "o2_limit" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
        .limit(50)),
    // A1/A3 + GROUP BY (beyond reference parity; the flagship agg).
    // DECIMAL sums for exact (associative) cross-engine equality; the
    // FINAL cast is DOUBLE because the driver's hash serializes
    // DECIMAL through a representation that drops trailing zeros on
    // one side ('179.60' → '179.6'), so any DECIMAL output column
    // hash-fails even with bit-identical values (r01+r02 root cause).
    // The decimal-domain sum stays exact; only the last cast is float.
    "q1_group_agg" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),
    // join + groupBy + decimal sum + sort: the canonical distributed
    // shape (revenue per nation). The price*(1-discount) product is
    // computed in the DECIMAL domain on both sides — a double-domain
    // product rounds differently across engines.
    "q2_join_group_topn" -> ((spark, sfDir) => {
      val l = Tables.load(spark, sfDir, "lineitem")
      val s = Tables.load(spark, sfDir, "supplier")
      val n = Tables.loadDim(spark, sfDir, "nation") // broadcast hint
      val revTerm = (col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .cast("decimal(18,4)")
      l.join(s, l("l_suppkey") === s("s_suppkey"))
        .join(n, s("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(revTerm).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    })
  )

  val oracle: Map[String, String] = Map(
    "s1_full_scan_count" -> s1,
    "s2_selective_scan" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_quantity < 5 AND l_discount >= 0.05",
    "p1_projection" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'P'""".stripMargin,
    "f1_numeric_cmp" -> f1,
    "f2_string_eq" -> f2,
    "f3_like" -> f3,
    "f4_in" -> f4,
    "f5_between" -> f5,
    "f6_null" -> f6,
    "f7_or" -> f7,
    "f8_timestamp" -> f8,
    "j1_join_2way" -> j2way,
    "j1_join_5way" -> j5way,
    "j1_join_7way" -> j7way,
    "j1_join_10way" -> j10way,
    "j1_join_alias" -> jAlias,
    "j1_join_17rel" -> j17rel,
    "a2_min_join" -> aMin,
    "o1_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "o2_limit" ->
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey LIMIT 50""".stripMargin,
    "q1_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_group_topn" ->
      """SELECT n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
