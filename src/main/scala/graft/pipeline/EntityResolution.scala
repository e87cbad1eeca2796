package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Entity resolution / record linkage — the "match the dirty import
  * against the master table" verb every large-scale data-integration
  * pipeline needs (and, for LLM corpora, the URL/author/source
  * canonicalization step before per-entity dedup or mixing).
  *
  * er1: a deterministic "CRM import" table is derived from customer
  * (~25% of rows by the md5-prefix rule both engines re-derive —
  * the dd5_blocked_tau09 planted-fixture pattern): one digit of the
  * 9-digit name suffix is bumped (+1 mod 10) at a key-derived
  * position. Resolution then runs the scalable ER shape:
  *
  *  1. BLOCKING via the deletion neighborhood (FastSS): each side
  *     emits 9 keys — the digit suffix with position i wildcarded.
  *     A single substitution leaves 1 of the 9 keys intact, so the
  *     (i, key) equi-join finds EVERY candidate within edit
  *     distance 1 with zero false dismissals, and the fan-out is a
  *     constant 9× map-side explode (never a cross join; the classic
  *     q-gram/LSH blocking role, exact here because the edit budget
  *     is 1).
  *  2. VERIFY with levenshtein ≤ 1 over the candidates only (both
  *     engines ship the identical Wagner-Fischer builtin).
  *  3. RESOLVE: best candidate per dirty row by (distance, custkey),
  *     reported with its verified-candidate count.
  *
  * The dense TPC-H key space makes the gate adversarial: a bumped
  * digit often lands EXACTLY on another customer's name (distance 0
  * beats the true source at distance 1) and every same-prefix
  * neighbor verifies at distance 1 — the ranked resolution must get
  * all of those right to hash-match.
  *
  * Scale: blocking keys are 9 rows per record (map-side), the block
  * join is an equi-join whose per-key groups are bounded by the
  * digit alphabet (≤10 same-key names per wildcard position in a
  * dense key space), verification touches candidates only, and the
  * resolve window partitions by dirty_id. Nothing is quadratic in
  * the table size.
  */
object EntityResolution {

  /** Digit suffix starts at position 10 of the 18-char name and is
    * [[SuffixLen]] digits long ("Customer#" + 9 digits). */
  private val SuffixStart = 10
  private val SuffixLen = 9

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er1_entity_resolution" -> ((spark, sfDir) => {
      val cust = Tables.load(spark, sfDir, "customer")
      val dirty = cust
        .filter(substring(md5(col("c_custkey").cast("string").cast("binary")), 1, 1)
          .isin("0", "1", "2", "3"))
        .select((col("c_custkey") + 1000000L).as("dirty_id"),
          concat(
            expr(s"substr(c_name, 1, cast(${SuffixStart - 1} + c_custkey % $SuffixLen as int))"),
            expr(s"cast((cast(substr(c_name, cast($SuffixStart + c_custkey % $SuffixLen as int), 1) as int) + 1) % 10 as string)"),
            expr(s"substr(c_name, cast(${SuffixStart + 1} + c_custkey % $SuffixLen as int))"))
            .as("dirty_name"))
      // the 9× key fan-out is a map-side generator (explode of a
      // constant sequence), not a join — each record emits its
      // deletion neighborhood in place
      val posFanout = explode(expr(s"sequence(1, $SuffixLen)")).as("i")
      def bkey(nameCol: String) = expr(
        s"concat(substr($nameCol, $SuffixStart, cast(i - 1 as int)), '*', " +
          s"substr($nameCol, cast($SuffixStart + i as int)))")
      val ckeys = cust.select(col("c_custkey"), col("c_name"), posFanout)
        .select(col("c_custkey"), col("c_name"), col("i"), bkey("c_name").as("bkey"))
      val dkeys = dirty.select(col("dirty_id"), col("dirty_name"), posFanout)
        .select(col("dirty_id"), col("dirty_name"), col("i").as("di"),
          bkey("dirty_name").as("dbkey"))
      val cand = dkeys.join(ckeys,
          col("di") === col("i") && col("dbkey") === col("bkey"))
        .select(col("dirty_id"), col("dirty_name"), col("c_custkey"), col("c_name"))
        .distinct()
      val ver = cand
        .select(col("dirty_id"), col("c_custkey"),
          levenshtein(col("dirty_name"), col("c_name")).cast("long").as("dist"))
        .filter(col("dist") <= 1)
      val w = Window.partitionBy(col("dirty_id"))
      ver
        .withColumn("rn", row_number().over(w.orderBy(col("dist"), col("c_custkey"))))
        .withColumn("n_cands", count(lit(1)).over(w))
        .filter(col("rn") === 1)
        .select(col("dirty_id"), col("c_custkey").as("resolved_custkey"),
          col("dist"), col("n_cands").cast("long").as("n_cands"))
    })
  )

  def oracle: Map[String, String] = Map(
    "er1_entity_resolution" ->
      s"""WITH dirty AS (
         |  SELECT c_custkey + 1000000 AS dirty_id,
         |    substr(c_name, 1, CAST(${SuffixStart - 1} + c_custkey % $SuffixLen AS INT))
         |      || CAST((CAST(substr(c_name, CAST($SuffixStart + c_custkey % $SuffixLen AS INT), 1) AS INT) + 1) % 10 AS VARCHAR)
         |      || substr(c_name, CAST(${SuffixStart + 1} + c_custkey % $SuffixLen AS INT)) AS dirty_name
         |  FROM customer
         |  WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')),
         |pos AS (SELECT unnest(range(1, ${SuffixLen + 1})) AS i),
         |ckeys AS (
         |  SELECT c.c_custkey, c.c_name, p.i,
         |    substr(c.c_name, $SuffixStart, CAST(p.i - 1 AS INT)) || '*'
         |      || substr(c.c_name, CAST($SuffixStart + p.i AS INT)) AS bkey
         |  FROM customer c, pos p),
         |dkeys AS (
         |  SELECT d.dirty_id, d.dirty_name, p.i,
         |    substr(d.dirty_name, $SuffixStart, CAST(p.i - 1 AS INT)) || '*'
         |      || substr(d.dirty_name, CAST($SuffixStart + p.i AS INT)) AS bkey
         |  FROM dirty d, pos p),
         |cand AS (
         |  SELECT DISTINCT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name
         |  FROM dkeys d JOIN ckeys c ON d.i = c.i AND d.bkey = c.bkey),
         |ver AS (
         |  SELECT dirty_id, c_custkey,
         |    CAST(levenshtein(dirty_name, c_name) AS BIGINT) AS dist
         |  FROM cand WHERE levenshtein(dirty_name, c_name) <= 1),
         |ranked AS (
         |  SELECT dirty_id, c_custkey, dist,
         |    row_number() OVER (PARTITION BY dirty_id
         |      ORDER BY dist, c_custkey) AS rn,
         |    count(*) OVER (PARTITION BY dirty_id) AS n_cands
         |  FROM ver)
         |SELECT dirty_id, c_custkey AS resolved_custkey, dist,
         |  CAST(n_cands AS BIGINT) AS n_cands
         |FROM ranked WHERE rn = 1""".stripMargin
  )
}
