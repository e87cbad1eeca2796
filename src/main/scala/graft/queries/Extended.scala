package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables

/** Beyond-parity relational operators (SURVEY §2.1 "not present
  * anywhere" list — out of reference-parity scope but free on Spark,
  * surfaced here so the physical operator coverage includes outer,
  * semi, and anti joins, set union, and DISTINCT aggregation, each
  * under the same DuckDB oracle gate).
  *
  * Physical mapping: x1 → SortMergeJoin LeftOuter, x2 → LeftSemi,
  * x3 → LeftAnti (NOT EXISTS), x4 → Union + hash aggregate, x5 →
  * distinct aggregation (HashAggregate with distinct expansion).
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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_left_outer_join" -> sql(x1),
    "x2_semi_join" -> sql(x2),
    "x3_anti_join" -> sql(x3),
    "x4_union_all" -> sql(x4),
    "x5_distinct_agg" -> sql(x5))

  val oracle: Map[String, String] = Map(
    "x1_left_outer_join" -> x1,
    "x2_semi_join" -> x2,
    "x3_anti_join" -> x3,
    "x4_union_all" -> x4,
    "x5_distinct_agg" -> x5)
}
