package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables

/** J2 — physical join-variant steering (SURVEY.md §2.1 J2: "the
  * choice among Hash/Merge/NL is the whole point"). The reference's
  * plan corpus ranks PG Hash/Merge/Nested-Loop variants; the Spark
  * analogs are BroadcastHash/SortMerge/ShuffledHash joins, steered
  * per-query with join hints — plan-local, no session-conf mutation,
  * so variants can run side by side in one session.
  *
  * Each variant runs the SAME logical query as its base (2-way join
  * `Relational` J1 shape) under a different physical strategy, and
  * shares the base query's DuckDB oracle — identical results under
  * every physical variant IS the J2 correctness property. The knob-
  * sweep generator (`planopt.Candidates`) produces these same
  * variants programmatically; these pinned entries keep J2 in the
  * per-round CORRECTNESS gate.
  *
  * Scale notes: BROADCAST is only hinted where a side is bounded
  * (customer at fixed selectivity); SHUFFLE_HASH avoids the sort at
  * the cost of in-memory hash build per partition — the classic
  * trade the comparator model learns to rank.
  */
object JoinVariants {

  private def hinted(hint: String): String =
    s"""SELECT /*+ $hint */ count(*) AS cnt FROM orders o, customer c
       |WHERE o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
       |  AND o.o_orderdate <= TIMESTAMP '1998-01-01 00:00:00'""".stripMargin

  private val oracleSql =
    """SELECT count(*) AS cnt FROM orders o, customer c
      |WHERE o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate <= TIMESTAMP '1998-01-01 00:00:00'""".stripMargin

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (spark, sfDir) => Tables.sql(spark, sfDir, q)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PG "Hash Join" analog, shuffle flavor
    "j2_variant_shuffle_hash" -> sql(hinted("SHUFFLE_HASH(c)")),
    // PG "Merge Join" analog
    "j2_variant_merge" -> sql(hinted("MERGE(c)")),
    // PG "Hash Join" analog, broadcast flavor (bounded build side)
    "j2_variant_broadcast" -> sql(hinted("BROADCAST(c)")))

  val oracle: Map[String, String] = Map(
    "j2_variant_shuffle_hash" -> oracleSql,
    "j2_variant_merge" -> oracleSql,
    "j2_variant_broadcast" -> oracleSql)
}
