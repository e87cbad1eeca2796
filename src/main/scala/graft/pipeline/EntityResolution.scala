package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    }),
    // er2: the edit-budget-2 GENERALIZATION — FastSS proper (Bocek
    // et al. 2007): every record emits its DELETION neighborhood up
    // to depth 2 — the name itself, the 18 one-char deletions, and
    // the C(18,2) = 153 two-char deletions (172 variants) — and the
    // block join is on VARIANT EQUALITY alone. The cover theorem:
    // ed(a,b) ≤ k ⟹ the depth-k deletion neighborhoods intersect, so
    // the join has zero false dismissals for FULL levenshtein ≤ 2 —
    // including the insert+delete pairs at equal length (shifted
    // digit runs) that a positional wildcard-pair key provably
    // misses (the first formulation here wildcarded position pairs;
    // the exhaustive-pair spec caught real lev-2 candidates escaping
    // it — that cover is exact only for substitution/Hamming
    // distance). Variants of different depths differ in LENGTH, so
    // the single join key cleanly separates them where alignment
    // requires it. The dirty fixture bumps TWO key-derived digit
    // positions (always distinct), so every planted record sits at
    // exactly distance 2 from its source — and, in the dense key
    // space, at ≤2 from several others via shifts and collisions.
    "er2_entity_resolution_d2" -> ((spark, sfDir) => {
      val cust = Tables.load(spark, sfDir, "customer")
      // bump digit at 0-based offset o (SQL helper, applied twice)
      def bump(inner: String, off: String): String =
        s"concat(substr($inner, 1, cast(9 + ($off) as int)), " +
          s"cast((cast(substr($inner, cast(10 + ($off) as int), 1) as int) + 1) % 10 as string), " +
          s"substr($inner, cast(11 + ($off) as int)))"
      val p1 = "c_custkey % 9"
      val p2 = s"(c_custkey % 9 + 1 + c_custkey % 8) % 9" // always != p1
      val dirty = cust
        .filter(substring(md5(col("c_custkey").cast("string").cast("binary")), 1, 1)
          .isin("0", "1", "2", "3"))
        .select((col("c_custkey") + 2000000L).as("dirty_id"),
          expr(bump(bump("c_name", p1), p2)).as("dirty_name"))
      // depth-≤2 deletion neighborhood, emitted map-side as ONE
      // array_distinct'd HOF array per record (interpreted lambdas,
      // string-op dominated — dc1/txt8's documented trade): dense
      // zero-runs make many deletion pairs inside one record collapse
      // to the SAME variant (deleting any two of six zeros is one
      // string), and per-record dedup BEFORE the join cuts the
      // measured sf1 join volume 3× (Σ group² 1.9e10 → 6.3e9,
      // fan-out rows 23M → 13.6M) with zero extra shuffles. Only the
      // (id, variant) pair rides the join — names re-attach after
      // the id-level candidate distinct.
      def variants(df: DataFrame, nameCol: String, pfx: String) = {
        val id = df.columns.head
        val vs =
          s"""array_distinct(concat(
             |  array($nameCol),
             |  transform(sequence(1, $NameLen), i ->
             |    concat(substr($nameCol, 1, i - 1), substr($nameCol, i + 1))),
             |  flatten(transform(sequence(1, ${NameLen - 1}), i ->
             |    transform(sequence(i + 1, $NameLen), j ->
             |      concat(substr($nameCol, 1, i - 1),
             |             substr($nameCol, i + 1, j - i - 1),
             |             substr($nameCol, j + 1)))))))""".stripMargin
        df.select(col(id).as(s"${pfx}_id"), explode(expr(vs)).as("variant"))
      }
      val ck = variants(cust.select(col("c_custkey"), col("c_name")), "c_name", "c")
        .withColumnRenamed("variant", "cvariant")
      val dk = variants(dirty, "dirty_name", "d")
      // the candidate DISTINCT carries only the 16-byte id pair — on
      // low-entropy keys (dense digit runs) the variant join's output
      // is the dominant shuffle, and dragging both 18-char names
      // through it multiplies the exchanged bytes (measured at sf1);
      // names re-attach via two narrow joins afterwards
      val cand = dk.join(ck, col("variant") === col("cvariant"))
        .select(col("d_id").as("dirty_id"), col("c_id").as("c_custkey"))
        .distinct()
      val ver = cand
        .join(dirty, "dirty_id")
        .join(cust.select(col("c_custkey"), col("c_name")), "c_custkey")
        .select(col("dirty_id"), col("c_custkey"),
          levenshtein(col("dirty_name"), col("c_name")).cast("long").as("dist"))
        .filter(col("dist") <= 2)
      val w = Window.partitionBy(col("dirty_id"))
      ver
        .withColumn("rn", row_number().over(w.orderBy(col("dist"), col("c_custkey"))))
        .withColumn("n_cands", count(lit(1)).over(w))
        .filter(col("rn") === 1)
        .select(col("dirty_id"), col("c_custkey").as("resolved_custkey"),
          col("dist"), col("n_cands").cast("long").as("n_cands"))
    })
  )

  /** Full name length (er2 wildcards every position pairwise). */
  private val NameLen = 18

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
         |FROM ranked WHERE rn = 1""".stripMargin,
    // er2: two bumped digits, depth-≤2 DELETION neighborhoods joined
    // on variant equality (FastSS), levenshtein <= 2 verify — same
    // ranked resolution.
    "er2_entity_resolution_d2" -> {
      def bump(inner: String, off: String): String =
        s"substr($inner, 1, CAST(9 + ($off) AS INT)) " +
          s"|| CAST((CAST(substr($inner, CAST(10 + ($off) AS INT), 1) AS INT) + 1) % 10 AS VARCHAR) " +
          s"|| substr($inner, CAST(11 + ($off) AS INT))"
      val dirtyName = bump(bump("c_name", "c_custkey % 9"),
        "(c_custkey % 9 + 1 + c_custkey % 8) % 9")
      def del1(n: String) =
        s"substr($n, 1, CAST(p.i - 1 AS INT)) || substr($n, CAST(p.i + 1 AS INT))"
      def del2(n: String) =
        s"substr($n, 1, CAST(p.i - 1 AS INT)) " +
          s"|| substr($n, CAST(p.i + 1 AS INT), CAST(p.j - p.i - 1 AS INT)) " +
          s"|| substr($n, CAST(p.j + 1 AS INT))"
      s"""WITH dirty AS (
         |  SELECT c_custkey + 2000000 AS dirty_id,
         |    $dirtyName AS dirty_name
         |  FROM customer
         |  WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')),
         |pos1 AS (SELECT unnest(range(1, ${NameLen + 1})) AS i),
         |pos AS (
         |  SELECT ii.i, jj.j
         |  FROM (SELECT unnest(range(1, ${NameLen + 1})) AS i) ii,
         |       (SELECT unnest(range(1, ${NameLen + 1})) AS j) jj
         |  WHERE jj.j > ii.i),
         |ckeys AS (
         |  SELECT DISTINCT c_custkey, c_name, bkey FROM (
         |  SELECT c_custkey, c_name, c_name AS bkey FROM customer
         |  UNION ALL
         |  SELECT c.c_custkey, c.c_name,
         |    substr(c.c_name, 1, CAST(p.i - 1 AS INT))
         |      || substr(c.c_name, CAST(p.i + 1 AS INT)) AS bkey
         |  FROM customer c, pos1 p
         |  UNION ALL
         |  SELECT c.c_custkey, c.c_name, ${del2("c.c_name")} AS bkey
         |  FROM customer c, pos p)),
         |dkeys AS (
         |  SELECT DISTINCT dirty_id, dirty_name, bkey FROM (
         |  SELECT dirty_id, dirty_name, dirty_name AS bkey FROM dirty
         |  UNION ALL
         |  SELECT d.dirty_id, d.dirty_name, ${del1("d.dirty_name")} AS bkey
         |  FROM dirty d, pos1 p
         |  UNION ALL
         |  SELECT d.dirty_id, d.dirty_name, ${del2("d.dirty_name")} AS bkey
         |  FROM dirty d, pos p)),
         |cand AS (
         |  SELECT DISTINCT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name
         |  FROM dkeys d JOIN ckeys c ON d.bkey = c.bkey),
         |ver AS (
         |  SELECT dirty_id, c_custkey,
         |    CAST(levenshtein(dirty_name, c_name) AS BIGINT) AS dist
         |  FROM cand WHERE levenshtein(dirty_name, c_name) <= 2),
         |ranked AS (
         |  SELECT dirty_id, c_custkey, dist,
         |    row_number() OVER (PARTITION BY dirty_id
         |      ORDER BY dist, c_custkey) AS rn,
         |    count(*) OVER (PARTITION BY dirty_id) AS n_cands
         |  FROM ver)
         |SELECT dirty_id, c_custkey AS resolved_custkey, dist,
         |  CAST(n_cands AS BIGINT) AS n_cands
         |FROM ranked WHERE rn = 1""".stripMargin
    }
  )
}
