package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      // r19: the shared packed-min hash-agg resolve (see
      // [[resolveBest]]) replaces the former per-dirty_id window,
      // which sorted the whole verified set through a corpus-wide
      // exchange just to take rank 1. min((dist << 61) | custkey) is
      // the same (dist, custkey) lexicographic rank the window's
      // row_number()=1 picked, and n_cands the same count — identical
      // rows, with a map-side partial agg instead of the sort
      // (er2/er3/er4 have run this resolve against the same ranked
      // oracle shape since r15).
      resolveBest(ver)
    }),
    // er2: the edit-budget-2 GENERALIZATION, with a LENGTH-UNIFORMITY
    // ROUTER over two exact blocking schemes (r13 verdict #1 — the
    // FastSS-only path was the one production operator that degraded
    // quadratically on low-entropy keyspaces):
    //
    //  FAST PATH (all names one length L — this corpus, and the
    //  common SKU/id/zero-padded-key shape that made FastSS
    //  quadratic): equal lengths force #insertions = #deletions in
    //  any edit script, so lev ≤ 2 decomposes EXACTLY into
    //    (a) ≤ 2 substitutions  — i.e. Hamming distance ≤ 2, or
    //    (b) 1 deletion + 1 insertion (a one-char block shift).
    //  Arm A covers (a) with WILDCARD-PAIR keys: each record emits
    //  its C(L,2) position-pair wildcardings; a Hamming-≤2 pair
    //  shares the key wildcarded at its mismatch positions, and a
    //  matching key forces equality everywhere else — the join
    //  output IS the Hamming ball (no false positives), so candidate
    //  volume collapses to the true-neighbor count even on dense
    //  decimal ids (group size per key ≤ alphabet², vs FastSS-2
    //  groups of 5550 and Σ group² = 6.3e9 at sf1: measured 170 s →
    //  see SCALE.md). Arm B covers (b) with the DEPTH-1 deletion
    //  neighborhood: if b deletes a[p] and inserts x at q, deleting
    //  x from b gives exactly a-minus-a[p], so del1(a) ∩ del1(b) ≠ ∅
    //  — depth 1, 18 variants/record, never the C(18,2) = 153 of
    //  depth 2. Positional wildcards ALONE provably miss case (b)
    //  (the r12 exhaustive-pair spec caught real lev-2 shift pairs
    //  escaping them); the union of the two arms is the exact cover.
    //
    //  FALLBACK (mixed lengths): FastSS proper (Bocek et al. 2007) —
    //  depth-≤2 deletion neighborhoods joined on variant equality,
    //  exact for full lev ≤ 2 at any length mix; kept verbatim as
    //  [[fastssD2Candidates]]. The router is one column-pruned
    //  min/max(length) aggregate over both sides.
    //
    // The dirty fixture bumps TWO key-derived digit positions
    // (always distinct), so every planted record sits at exactly
    // distance 2 from its source — and, in the dense key space, at
    // ≤2 from several others via shifts and collisions. Only id
    // pairs ride the arm joins (the r12 byte-volume lesson); the
    // fast path never re-attaches names at all — the pair-dedup
    // aggregate decodes the exact distance structurally (see
    // [[equalLenD2Verified]]).
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
      val custNames = cust.select(col("c_custkey"), col("c_name"))
      resolveBest(d2Verified(dirty, custNames))
    }),
    // er3: the MIXED-LENGTH gate for the router's segment route (r14
    // verdict #5), in the regime the segment route is FOR (see
    // SegMinLen): a LONG COMPOSITE key — the customer name plus a
    // 12-hex-char md5-derived discriminator (the "name|sourcehash"
    // shape of a canonicalization key), L = 31. Each planted record
    // bumps ONE name digit and DELETES one other key-derived digit,
    // so the dirty side is uniformly length 30 against the 31-char
    // master — the union probe sees lo ≠ hi and hi ≥ SegMinLen, and
    // d2Verified routes to [[passJoinD2Verified]]. Every planted
    // record sits at lev 2 from its source (1 sub + 1 del). The
    // oracle is the same FastSS-shape re-derivation as er2's
    // (deletion neighborhoods cover ANY ≤31-char mix: out-of-range
    // positions produce no-op variants that DISTINCT collapses), so
    // the segment path is graded against an independently-derived
    // exact cover.
    "er3_er_mixed_len" -> ((spark, sfDir) => {
      val cust = Tables.load(spark, sfDir, "customer")
      def bump(inner: String, off: String): String =
        s"concat(substr($inner, 1, cast(9 + ($off) as int)), " +
          s"cast((cast(substr($inner, cast(10 + ($off) as int), 1) as int) + 1) % 10 as string), " +
          s"substr($inner, cast(11 + ($off) as int)))"
      def del(inner: String, off: String): String =
        s"concat(substr($inner, 1, cast(9 + ($off) as int)), " +
          s"substr($inner, cast(11 + ($off) as int)))"
      val longKey =
        "concat(c_name, '|', substr(md5(cast(cast(c_custkey as string) as binary)), 17, 12))"
      val p1 = "c_custkey % 9"
      val pDel = s"(c_custkey % 9 + 1 + c_custkey % 8) % 9" // always != p1
      val dirty = cust
        .filter(substring(md5(col("c_custkey").cast("string").cast("binary")), 1, 1)
          .isin("0", "1", "2", "3"))
        .select((col("c_custkey") + 3000000L).as("dirty_id"),
          expr(del(bump(longKey, p1), pDel)).as("dirty_name"))
      val custNames = cust.select(col("c_custkey"), expr(longKey).as("c_name"))
      resolveBest(d2Verified(dirty, custNames))
    }),
    // er4: the SHORT DENSE MIXED-LENGTH gate for the router's
    // length-aware del+wildcard route (late r15 — the r14 verdict-#5
    // residual; see [[delWildcardD2Verified]] for the two-step
    // measurement that first ruled the blind six-arm form out and
    // then, with length-profile pruning, ruled it IN). The master key
    // is 'K#' + the 9-digit zero-padded custkey — maximally dense by
    // construction; each planted record bumps one key-derived digit
    // and DELETES one other, so the dirty side is uniformly length 10
    // against the 11-char master (lo=10, hi=11, '*'-free →
    // DelWildcardRoute, with exactly ONE viable arm). Every planted
    // record sits at lev 2 from its source; the dense decimal space
    // supplies closer collisions the resolution must rank correctly.
    // Oracle: the same independent FastSS-shape re-derivation as
    // er2/er3 (exact at any length mix).
    "er4_er_short_mixed" -> ((spark, sfDir) => {
      val cust = Tables.load(spark, sfDir, "customer")
      // digit helpers at prefix width 2 ('K#'): digit offset o lives
      // at 1-based string position 3 + o
      def bump(inner: String, off: String): String =
        s"concat(substr($inner, 1, cast(2 + ($off) as int)), " +
          s"cast((cast(substr($inner, cast(3 + ($off) as int), 1) as int) + 1) % 10 as string), " +
          s"substr($inner, cast(4 + ($off) as int)))"
      def del(inner: String, off: String): String =
        s"concat(substr($inner, 1, cast(2 + ($off) as int)), " +
          s"substr($inner, cast(4 + ($off) as int)))"
      val shortKey = "concat('K#', lpad(cast(c_custkey as string), 9, '0'))"
      val p1 = "c_custkey % 9"
      val pDel = s"(c_custkey % 9 + 1 + c_custkey % 8) % 9" // always != p1
      val dirty = cust
        .filter(substring(md5(col("c_custkey").cast("string").cast("binary")), 1, 1)
          .isin("0", "1", "2", "3"))
        .select((col("c_custkey") + 4000000L).as("dirty_id"),
          expr(del(bump(shortKey, p1), pDel)).as("dirty_name"))
      val custNames = cust.select(col("c_custkey"), expr(shortKey).as("c_name"))
      resolveBest(d2Verified(dirty, custNames))
    })
  )

  /** Best candidate per dirty row by (dist, custkey), with candidate
    * count — shared by er2/er3. Dense keyspaces verify ~10³
    * candidates per dirty row, so the resolve is a 50M-row reduction
    * at sf1. min over the PACKED (dist << 61) | custkey long is the
    * same (dist, custkey) lexicographic rank (dist ≤ 2, ids positive
    * < 2^61 — TPC-H keys are ≤ 2^32); a long buffer keeps it a
    * HashAggregate with a map-side partial, where min(struct) would
    * fall to a SortAggregate and sort the whole verified set (er1's
    * window has the same sort — fine there, its candidate sets are
    * tiny). */
  private def resolveBest(ver: DataFrame): DataFrame =
    ver.groupBy(col("dirty_id"))
      .agg(min(shiftleft(col("dist"), 61).bitwiseOR(col("c_custkey"))).as("packed"),
        count(lit(1)).as("n_cands"))
      .select(col("dirty_id"),
        col("packed").bitwiseAND(lit((1L << 61) - 1)).as("resolved_custkey"),
        shiftright(col("packed"), 61).as("dist"),
        col("n_cands").cast("long").as("n_cands"))

  /** Full name length (the DuckDB oracle enumerates every position at
    * this fixed width; the Spark paths derive L from the data). */
  private val NameLen = 18

  /** The four exact lev-≤2 blocking schemes [[d2Verified]] routes
    * over (r14 verdict #5 made the router three-way; late r15 adds
    * the length-aware del+wildcard route for short dense mixed-length
    * corpora — measured 1.55× cheaper than FastSS there and
    * diverging, see [[delWildcardD2Verified]]). */
  private[graft] sealed trait D2Route
  private[graft] case object EqualLenRoute extends D2Route
  private[graft] case object SegmentsRoute extends D2Route
  private[graft] case object DelWildcardRoute extends D2Route
  private[graft] case object FastSSRoute extends D2Route

  /** Minimum key length for the segment route. MEASURED crossover
    * (r15, join-volume + fan-out prototype over the TPC-H-shape
    * fixtures, recorded in SCALE.md): FastSS depth-2's cost is
    * n·(1+L+C(L,2)) emitted variants of ~L chars (quadratic in L)
    * plus Σ group² join volume; the segment join's cost is O(n) short
    * keys plus Σ window·|group| volume governed by per-segment
    * entropy. On SHORT dense keys (TPC-H 18-char names: 9 constant +
    * 9 dense digits) FastSS wins — its join volume tracks the lev-≤4
    * ball (13.9M at n=60k) while ANY contiguous-substring scheme
    * pays window·n/distinct (segments: 112M tight-window volume at
    * the same n; there are only 10³ values a 3-digit segment can
    * take — an information floor no cut choice escapes). On LONGER
    * composite keys (name|hash, L=31+) the emission term dominates
    * and flips it: FastSS 34M long rows vs 330k short segment rows at
    * n=60k, with segment groups near-unique. The router therefore
    * sends mixed-length corpora to segments only above this length;
    * below it FastSS's neighborhood is both small (C(12,2)=66) and
    * group-optimal. */
  private[graft] val SegMinLen = 24

  /** Route decision from the corpus-shape probe: uniform length ≥ 3
    * with a '*'-free alphabet → the wildcard-pair fast path; mixed
    * lengths with max length ≥ [[SegMinLen]] → PassJoin segment
    * filters (exact at any length mix, no wildcard alphabet
    * constraint); SHORT mixed lengths with a '*'-free alphabet → the
    * length-aware del+wildcard scheme (late r15: the r14-cited
    * upgrade, routed only after arm pruning flipped its measurement —
    * see [[delWildcardD2Verified]]); everything else → FastSS (exact
    * for any shape). Exposed so the dispatch itself is
    * spec-pinnable. */
  private[graft] def routeFor(lo: Int, hi: Int, star: Int): D2Route =
    if (lo == hi && lo >= 3 && star == 0) EqualLenRoute
    else if (lo >= 3 && hi >= SegMinLen) SegmentsRoute
    else if (lo >= 3 && star == 0) DelWildcardRoute
    else FastSSRoute

  /** VERIFIED lev-≤2 pairs (dirty_id, c_custkey, dist), zero false
    * dismissals AND zero false positives, schemes routed by the
    * corpus shape — see the er2 header comment and [[routeFor]]. The
    * router probe is a single column-pruned aggregate over both sides
    * (a metadata-scale action at plan-construction time, the
    * dd10/clu1 adaptive-parameter discipline). */
  private[graft] def d2Verified(dirty: DataFrame, cust: DataFrame): DataFrame = {
    val probe = dirty.select(length(col("dirty_name")).as("l"),
        instr(col("dirty_name"), "*").as("s"))
      .union(cust.select(length(col("c_name")), instr(col("c_name"), "*")))
      .agg(min(col("l")).as("lo"), max(col("l")).as("hi"),
        max(col("s")).as("star")).head()
    // empty inputs leave the global min/max null — route to the
    // fallback (which correctly yields an empty result) instead of
    // NPE-ing on getInt
    if (probe.isNullAt(0)) fastssD2Verified(dirty, cust)
    else routeFor(probe.getInt(0), probe.getInt(1), probe.getInt(2)) match {
      case EqualLenRoute => equalLenD2Verified(dirty, cust, probe.getInt(0))
      case SegmentsRoute => passJoinD2Verified(dirty, cust)
      case DelWildcardRoute => delWildcardD2Verified(dirty, cust)
      case FastSSRoute => fastssD2Verified(dirty, cust)
    }
  }

  /** Equal-length fast path: wildcard-pair keys (Hamming ≤ 2, exact
    * ball join) ∪ depth-1 deletion neighborhood (the 1-del+1-ins
    * shift case). Both are map-side HOF fan-outs into plain
    * equi-joins; per-key groups are bounded by alphabet² even on
    * dense zero-padded decimal keys, so candidate volume tracks the
    * TRUE neighbor count instead of Σ group² over deletion variants.
    *
    * The distance needs NO levenshtein pass — it is decoded from the
    * arm-A match count m per pair (exact because keys are the literal
    * pattern strings and the router pinned '*' out of the alphabet):
    * a Hamming-0 pair matches all C(L,2) wildcardings, Hamming-1
    * matches the L−1 containing its mismatch, Hamming-2 exactly the
    * one at its mismatch pair — and for equal lengths lev = Hamming
    * whenever Hamming ≤ 2 (lev < h would force Hamming < h). Pairs
    * seen only by arm B are lev = 2 by the FastSS bound (a shared
    * depth-1 deletion IS a 1-del+1-ins script, and lev ≤ 1 would put
    * them in arm A). So the pair-group aggregate that dedups the
    * fan-out also VERIFIES it: no name re-attach joins, no 50M-row
    * levenshtein, one exchange total past the arm joins. L ≥ 3 keeps
    * the three m-classes distinct (router-enforced).
    *
    * Fan-out is C(L,2)+L keys/record — the short-key ER shape
    * (names, SKUs, ids); long-string ER belongs to dd3/dd9 MinHash,
    * not edit distance. */
  private[graft] def equalLenD2Verified(dirty: DataFrame, cust: DataFrame,
                                        len: Int): DataFrame = {
    // r18 (guide §2.3 — shuffle fewer bytes by emitting fewer keys):
    // a position where EVERY string of BOTH sides carries the same
    // character can never host a mismatch, so every Hamming-≤2 pair's
    // mismatch set lies inside the VARYING positions and arm A only
    // needs the C(V,2) wildcard pairs over them — on the TPC-H name
    // shape (9-char constant prefix + 9 dense digits) that is 36 keys
    // per record instead of C(18,2) = 153, a 4.3× cut of the dominant
    // emission. The m-decode constants shift with it by the SAME
    // matching argument: Hamming-0 pairs match all C(V,2) prunned
    // wildcardings, Hamming-1 (mismatch q ∈ V) the V−1 containing q,
    // Hamming-2 (mismatches ⊆ V) exactly one. V ≥ 3 keeps the classes
    // distinct; below that (near-degenerate corpora) the full 1..L set
    // is used, preserving the router's L ≥ 3 guarantee. The probe is
    // one bounded (position × char-range) aggregate over both sides —
    // the dd10/clu1/passJoinSegSpecs adaptive-parameter discipline.
    // Arm B (del1) is NOT prunable this way: a one-char block shift
    // moves characters THROUGH constant positions, so its deletion
    // neighborhood must stay complete — it is the cheap arm (L keys).
    val varyingProbe = dirty.select(col("dirty_name").as("s"))
      .union(cust.select(col("c_name").as("s")))
      .select(posexplode(expr("split(s, '')")).as(Seq("p", "ch")))
      .groupBy(col("p")).agg(min(col("ch")).as("lo"), max(col("ch")).as("hi"))
      .collect()
    val varying0 = varyingProbe
      .filter(r => r.getString(1) != r.getString(2))
      .map(_.getInt(0) + 1).sorted.toSeq
    val varying = if (varying0.length >= 3) varying0 else (1 to len)
    // wildcard pairs over the varying set: a HOF transform over the
    // LITERAL (i, j) pair array — measured faster than both the full
    // 1..L nested-sequence form (fewer pairs) and a flat literal array
    // of C(V,2) concat terms (giant array constructors codegen worse
    // than the tight HOF loop: 0.42 s vs 0.55 s warm at V=9, sf0.1)
    def wildPairs(nameCol: String) = {
      val pairsLit = (for {
        a <- varying.indices
        b <- a + 1 until varying.length
      } yield s"struct(${varying(a)} as i, ${varying(b)} as j)")
        .mkString("array(", ",", ")")
      s"""transform($pairsLit, p ->
         |  concat(substr($nameCol, 1, p.i - 1), '*',
         |         substr($nameCol, p.i + 1, p.j - p.i - 1), '*',
         |         substr($nameCol, p.j + 1)))""".stripMargin
    }
    // depth-1 deletions; array_distinct collapses equal-char runs
    // (deleting any zero of a zero run is one variant) map-side
    def del1(nameCol: String) =
      s"""array_distinct(transform(sequence(1, $len), i ->
         |  concat(substr($nameCol, 1, i - 1), substr($nameCol, i + 1))))""".stripMargin
    // the dirty side is the smaller fan-out — shuffle_hash builds on
    // it instead of sort-merge sorting the C(V,2)×|cust| pattern stream
    def keys(df: DataFrame, nameCol: String, pfx: String, gen: String => String) =
      df.select(col(df.columns.head).as(s"${pfx}_id"),
        explode(expr(gen(nameCol))).as(s"${pfx}_key"))
    def arm(gen: String => String, inA: Int) =
      keys(dirty, "dirty_name", "d", gen).hint("shuffle_hash")
        .join(keys(cust, "c_name", "c", gen), col("d_key") === col("c_key"))
        .select(col("d_id").as("dirty_id"), col("c_id").as("c_custkey"),
          lit(inA.toLong).as("in_a"))
    val v = varying.length
    arm(wildPairs, 1).union(arm(del1, 0))
      .groupBy(col("dirty_id"), col("c_custkey"))
      .agg(sum(col("in_a")).as("m"))
      .select(col("dirty_id"), col("c_custkey"),
        when(col("m") === lit(v.toLong * (v - 1) / 2), 0L)
          .when(col("m") === lit((v - 1).toLong), 1L)
          .otherwise(2L).as("dist"))
  }

  /** MIXED-LENGTH route — PassJoin segment filters (Li et al. 2011,
    * the r14 verdict-#5 item), with ENTROPY-CHOSEN segment
    * boundaries:
    *
    * Partition every indexed (cust) string into τ+1 = 3 contiguous
    * segments. For a pair within lev ≤ 2, pigeonhole leaves ≥ 1
    * segment untouched by the edit script, and its occurrence in the
    * other string shifts by at most the net indels before it (≤ τ) —
    * so joining cust segments (keyed by length class, segment index,
    * content) against every dirty substring in the ±τ window of that
    * segment's position has ZERO false dismissals; levenshtein over
    * the candidate pairs removes the false positives. Cost: the cust
    * side emits 3 keys/record, the dirty side ≤ 5 lengths × 3
    * segments × 5 window starts — both map-side HOF fan-outs into a
    * plain equi-join, vs FastSS depth-2's 1+L+C(L,2) variants whose
    * low-entropy groups drive Σ group² quadratic.
    *
    * The textbook even partition is a TRAP on exactly the corpora
    * that need this route: a shared constant prefix ("Customer#…",
    * zero-padded ids) makes segment 1 a single giant group and the
    * candidate join quadratic. Boundary choice does NOT affect
    * exactness (any 3-partition satisfies the pigeonhole), so the
    * cuts are chosen ADAPTIVELY per length class to maximize the
    * MINIMUM per-segment character entropy — one bounded
    * (length × position × char) aggregate on the indexed side (the
    * dd10/sim3 plan-derivation discipline), then a driver-side
    * enumeration of the ≤ C(L−1,2) cut pairs. On TPC-H names this
    * folds the 9-char constant prefix into segment 1 alongside 3
    * digits, leaving every segment ~3 digits of entropy (group sizes
    * ~n/1000 instead of n).
    *
    * Requires every string length ≥ 3 (router-enforced); exact for
    * any length mix and any alphabet ('*' included — keys are literal
    * substrings, not wildcard patterns). */
  private[graft] def passJoinD2Candidates(dirty: DataFrame, cust: DataFrame): DataFrame = {
    val spark = cust.sparkSession
    import spark.implicits._
    val specs = broadcast(
      passJoinSegSpecs(cust).toDF("l1", "seg_idx", "seg_start", "seg_width"))
    val (dkeys, ckeys) = passJoinKeys(dirty, cust, specs)
    dkeys.hint("shuffle_hash")
      .join(ckeys, Seq("l1", "seg_idx", "seg"))
      .select(col("dirty_id"), col("c_custkey"))
      .distinct()
  }

  /** The two key frames behind the segment candidate join, exposed so
    * the degradation spec can measure JOIN VOLUME (Σ over keys of
    * |dirty keys| × |cust keys| — the quantity FastSS's Σ group²
    * blows up, invisible in deduped candidate counts). */
  private[graft] def passJoinKeys(dirty: DataFrame, cust: DataFrame,
      specs: DataFrame): (DataFrame, DataFrame) = {
    // indexed side: 3 literal segment keys per record
    val ckeys = cust.join(specs, length(col("c_name")) === col("l1"))
      .select(col("c_custkey"), col("l1"), col("seg_idx"),
        expr("substr(c_name, seg_start, seg_width)").as("seg"))
    // probe side: for each candidate length class within ±τ, the
    // substrings of the segment's width starting inside the
    // MULTI-MATCH-AWARE window (PASS-JOIN Lemma, Li et al. 2011): an
    // untouched segment i shifts by at most the edits BEFORE it
    // (≤ i−1 among the positions the pigeonhole leaves) and must also
    // land consistently with the total length delta Δ (edits AFTER it
    // ≤ τ+1−i), so s ∈ [p−(i−1), p+(i−1)] ∩ [p+Δ−(τ+1−i), p+Δ+(τ+1−i)]
    // — window sizes 1/≤3/1 instead of the loose ±τ's 5/5/5 (3× less
    // join volume, measured).
    // the ±τ length-class fan-out is an explicit generator so the
    // specs join stays an EQUI-join (a ≤ predicate against the
    // broadcast specs frame would plan as BroadcastNestedLoopJoin —
    // harmless at 15 spec rows but a banned operator in the audit)
    val dkeys = dirty
      .withColumn("l1", explode(expr(
        s"sequence(length(dirty_name) - $Tau, length(dirty_name) + $Tau)")))
      .join(specs, "l1")
      .withColumn("delta", length(col("dirty_name")) - col("l1"))
      .withColumn("w_lo", greatest(lit(1),
        col("seg_start") - (col("seg_idx") - 1),
        col("seg_start") + col("delta") - (lit(Tau + 1) - col("seg_idx"))))
      .withColumn("w_hi", least(
        length(col("dirty_name")) - col("seg_width") + 1,
        col("seg_start") + (col("seg_idx") - 1),
        col("seg_start") + col("delta") + (lit(Tau + 1) - col("seg_idx"))))
      .filter(col("w_hi") >= col("w_lo")) // sequence(a,b) is DESCENDING for a>b
      .select(col("dirty_id"), col("l1"), col("seg_idx"),
        explode(expr("transform(sequence(w_lo, w_hi), s -> " +
          "substr(dirty_name, s, seg_width))")).as("seg"))
    (dkeys, ckeys)
  }

  /** The entropy-cut segment boundaries per length class of `cust`:
    * rows (length, segIdx 1..3, 1-based start, width). One bounded
    * (length × position × char) aggregate, then a driver-side
    * enumeration of the ≤ C(L−1,2) cut pairs maximizing the MINIMUM
    * per-segment character entropy (deterministic tie-breaks: most
    * balanced widths, then smallest cut positions). */
  private[graft] def passJoinSegSpecs(cust: DataFrame): Seq[(Int, Int, Int, Int)] = {
    val stats = cust
      .select(length(col("c_name")).as("len"),
        posexplode(expr("split(c_name, '')")).as(Seq("pos", "ch")))
      .groupBy(col("len"), col("pos"), col("ch")).count()
      .collect()
      .groupBy(_.getInt(0))
    stats.toSeq.sortBy(_._1).flatMap { case (len, rows) =>
      val entropy = Array.fill(len)(0.0)
      rows.groupBy(_.getInt(1)).foreach { case (pos, prows) =>
        val total = prows.map(_.getLong(3)).sum.toDouble
        entropy(pos) = -prows.map { r =>
          val p = r.getLong(3) / total
          p * math.log(p)
        }.sum
      }
      val prefix = entropy.scanLeft(0.0)(_ + _) // prefix(i) = Σ entropy[0,i)
      def segE(a: Int, b: Int) = prefix(b) - prefix(a) // positions [a,b)
      // cuts 1 <= c1 < c2 < len → segments [0,c1) [c1,c2) [c2,len).
      // Objective: MINIMIZE expected join volume Σ_i window_i /
      // exp(entropy_i) — each segment's group size scales as
      // n / e^entropy and its probe multiplicity as the Δ=0 window
      // size (1/3/1 under the multi-match-aware bounds). Measured 1.7×
      // less volume than max-min-entropy cuts on the TPC-H-name shape
      // (both exact: cut choice never affects the pigeonhole cover).
      val (c1, c2) = (for { i <- 1 until len; j <- i + 1 until len } yield {
        val cost = 1.0 / math.exp(segE(0, i)) +
          3.0 / math.exp(segE(i, j)) + 1.0 / math.exp(segE(j, len))
        ((cost, i, j), (i, j))
      }).minBy(_._1)._2
      Seq((len, 1, 1, c1), (len, 2, c1 + 1, c2 - c1), (len, 3, c2 + 1, len - c2))
    }
  }

  /** [[passJoinD2Candidates]] + the levenshtein ≤ 2 verify over
    * re-attached names — the segment route's verified pairs. */
  private[graft] def passJoinD2Verified(dirty: DataFrame, cust: DataFrame): DataFrame =
    passJoinD2Candidates(dirty, cust)
      .join(dirty, "dirty_id")
      .join(cust, "c_custkey")
      .select(col("dirty_id"), col("c_custkey"),
        levenshtein(col("dirty_name"), col("c_name")).cast("long").as("dist"))
      .filter(col("dist") <= Tau)

  private val Tau = 2

  /** The LENGTH-AWARE del+wildcard generalization of the equal-length
    * fast path — the r14-verdict-cited alternative for SHORT
    * MIXED-LENGTH dense corpora, now the routed scheme there.
    * lev ≤ 2 across a length delta δ = |L₁ − L₂| ≤ 2 decomposes
    * exactly into:
    *   δ=0: Hamming ≤ 2 (two-wildcard patterns), or a one-char block
    *        shift (depth-1 deletions on both sides) — the er2 cover;
    *   δ=1: 1 deletion + ≤ 1 substitution — the longer side's del1
    *        patterns, each wildcarded at ≤ 1 position, meet the
    *        shorter side's ≤-1-wildcard patterns (a del-only pair
    *        matches with the wildcard at any shared position, so no
    *        separate 0-wildcard arm is needed);
    *   δ=2: 2 deletions — the longer side's del2 patterns meet the
    *        shorter side VERBATIM.
    * Six equi-join arms (both directions of the asymmetric ones);
    * candidates are DISTINCT'd and levenshtein-verified. No arm ever
    * joins depth-2 deletions against depth-2 deletions, so candidate
    * volume tracks the lev-≤3 ball instead of FastSS's lev-≤4 ball.
    *
    * THE LENGTH-PROFILE PRUNING that makes it win (and the
    * measurement history — both halves CurationSpec-pinned): every
    * generator shifts a string's length by a constant, and equal keys
    * have equal lengths, so an arm can only match where the two
    * sides' shifted length sets intersect. [[delWildcardArms]]
    * derives each side's distinct-length profile with one
    * metadata-scale aggregate (the dd10/clu1 adaptive-parameter
    * discipline), drops unsatisfiable arms entirely, and filters each
    * surviving arm's emission to the rows whose length can match.
    * Blind six-arm emission measured OUT (~4.8× FastSS's rows for a
    * wash in total cost — the first r15 measurement); with the
    * pruning, emission on a (10,11) corpus collapses to the ONE
    * viable arm and the scheme beats FastSS **1.17× at n=2k and
    * 1.55× at n=20k, DIVERGING toward the ~1.7× lev-ball ratio**
    * (join volume 6.2M vs 10.7M at n=20k) — so the router now sends
    * short mixed '*'-free corpora here. Exact for any '*'-free
    * length mix (lengths ≥ 3), gate-hashed by er4 against the
    * independent FastSS-shape oracle. */
  private[graft] def delWildcardD2Verified(dirty: DataFrame,
                                           cust: DataFrame): DataFrame = {
    val (cover, markers) = delWildcardAllArms(dirty, cust)
    if (cover.isEmpty)
      // no length pair within τ — provably no lev-≤2 pair exists
      // (every marker arm's shifts coincide with a cover arm's, so
      // markers are empty too)
      return dirty.select(col(dirty.columns.head).as("dirty_id"))
        .limit(0)
        .withColumn("c_custkey", lit(0L))
        .withColumn("dist", lit(0L))
    // r19 MARKER-JOIN dist decode (the r18 "dist-decode" residual,
    // guide §2.4 — remove whole passes): with literal pattern-string
    // keys, EVERY arm match is a true lev-≤2 pair by construction
    // (each arm's key equality exhibits an edit script of cost ≤ 2),
    // so no levenshtein verify is needed — and the former r18
    // xxhash64 key compression is dropped WITH the verify (suite A/B
    // medians 2.371 hashed vs 2.354 string: a wash at bench scale;
    // exactness now REQUIRES collision-free keys). The remaining
    // question per pair is only the VALUE of dist, and that is
    // decoded from membership in three cheap MARKER arms:
    //   dist 0 ⟺ the strings are equal        → (self, self) arm
    //   dist 1 ⟺ one substitution (δ=0 — both sides wildcarded at
    //            the same position match)      → (wc1, wc1) arm
    //         or one pure indel (δ=1 — the longer side's del1 set
    //            contains the shorter string)  → (self, del1) arms
    //   dist 2 ⟺ any cover-arm match not in a marker.
    //   (No false positives: an eq match IS dist 0; a wc1∕wc1 match
    //   forces equality outside one position, and unequal strings of
    //   equal length have dist ≥ 1; a self∕del1 match exhibits one
    //   deletion and unequal lengths force dist ≥ 1.)
    // dist = min over matched arms' bounds, one pair-keyed aggregate
    // — the groupBy replaces the old distinct (same exchange), and
    // the two corpus-sized name re-attach joins plus the levenshtein
    // pass over 735k candidates (sf0.1) are gone. Same discipline as
    // er2's m-decode, generalized to the mixed-length route.
    (cover.map { case (dk, ck) => (dk, ck, 2L) } ++ markers)
      .map { case (dk, ck, ub) =>
        dk.hint("shuffle_hash")
          .join(ck, col("d_key") === col("c_key"))
          .select(col("d_id").as("dirty_id"), col("c_id").as("c_custkey"),
            lit(ub).as("ub"))
      }
      .reduce(_ union _)
      .groupBy(col("dirty_id"), col("c_custkey"))
      .agg(min(col("ub")).as("dist"))
  }

  /** The VIABLE (dirty-keys, cust-keys) arm frames behind
    * [[delWildcardD2Verified]] — length-profile-pruned (see the
    * route Scaladoc), exposed so the degradation spec can measure
    * per-arm JOIN VOLUME and emission against FastSS's. Each
    * generator shifts length by a constant (wc2/wc1/self: 0,
    * del1/del1wc1: 1, del2: 2); an arm survives iff
    * {l − dShift : l ∈ dirty lengths} ∩ {l − cShift : l ∈ cust
    * lengths} ≠ ∅, and each side's emission is filtered to the rows
    * whose shifted length lands in that intersection — string
    * equality implies length equality, so dropped emissions can
    * never have matched and the result is provably unchanged. */
  private[graft] def delWildcardArms(dirty: DataFrame, cust: DataFrame)
      : Seq[(DataFrame, DataFrame)] =
    delWildcardAllArms(dirty, cust)._1

  // The pattern generators behind the del+wildcard arms (pure SQL
  // fragment builders over a name column).
  private val dwL = (n: String) => s"length($n)"
  private def dwSelf(n: String) = s"array($n)"
  private def dwWc1(n: String) =
    s"""transform(sequence(1, ${dwL(n)}), i ->
       |  concat(substr($n, 1, i - 1), '*', substr($n, i + 1)))""".stripMargin
  private def dwWc2(n: String) =
    s"""flatten(transform(sequence(1, ${dwL(n)} - 1), i ->
       |  transform(sequence(i + 1, ${dwL(n)}), j ->
       |    concat(substr($n, 1, i - 1), '*',
       |           substr($n, i + 1, j - i - 1), '*',
       |           substr($n, j + 1)))))""".stripMargin
  private def dwDel1(n: String) =
    s"""array_distinct(transform(sequence(1, ${dwL(n)}), i ->
       |  concat(substr($n, 1, i - 1), substr($n, i + 1))))""".stripMargin
  // depth-1 deletion then one wildcard: the δ=1 longer-side arm.
  // Built by wildcarding each del1 variant at every position;
  // array_distinct collapses the (deleted run, wildcard) overlaps.
  private def dwDel1wc1(n: String) =
    s"""array_distinct(flatten(transform(${dwDel1(n)}, v ->
       |  transform(sequence(1, length(v)), q ->
       |    concat(substr(v, 1, q - 1), '*', substr(v, q + 1))))))""".stripMargin
  private def dwDel2(n: String) =
    s"""array_distinct(flatten(transform(sequence(1, ${dwL(n)} - 1), i ->
       |  transform(sequence(i + 1, ${dwL(n)}), j ->
       |    concat(substr($n, 1, i - 1),
       |           substr($n, i + 1, j - i - 1),
       |           substr($n, j + 1))))))""".stripMargin

  /** COVER arms plus MARKER arms (r19), sharing one length-profile
    * probe. Cover arms are the exact lev-≤2 candidate cover (see
    * [[delWildcardD2Verified]]); marker arms are the strict-subset
    * joins whose membership decodes each pair's exact distance
    * (dist bound rides in the third tuple slot):
    *   (self, self)  → 0 (string equality)
    *   (wc1,  wc1)   → 1 (δ=0 single substitution)
    *   (self, del1) / (del1, self) → 1 (δ=1 pure indel)
    * Each marker's length shifts coincide with a cover arm's, so the
    * same viability pruning applies and markers never emit where no
    * cover arm does. */
  private[graft] def delWildcardAllArms(dirty: DataFrame, cust: DataFrame)
      : (Seq[(DataFrame, DataFrame)], Seq[(DataFrame, DataFrame, Long)]) = {
    // length profiles: one metadata-scale aggregate per side (the
    // dd10/clu1 adaptive-parameter discipline — distinct lengths are
    // bounded by the key format, not the corpus)
    // ONE probe action for both sides (r18 — the suite is
    // action-latency-bound at bench scale; two separate collects paid
    // two plan+dispatch rounds for two bounded sets)
    val Seq(dLens, cLens) = {
      val rows = dirty.select(lit(0).as("side"), length(col("dirty_name")).as("l"))
        .union(cust.select(lit(1), length(col("c_name"))))
        .groupBy(col("side")).agg(collect_set(col("l")).as("ls"))
        .collect()
      Seq(0, 1).map(s => rows.find(_.getInt(0) == s)
        .map(_.getSeq[Int](1).toSet).getOrElse(Set.empty[Int]))
    }
    def keys(df: DataFrame, nameCol: String, pfx: String,
             gen: String => String, okLens: Set[Int]): DataFrame =
      df.filter(length(col(nameCol)).isin(okLens.toSeq.map(Int.box): _*))
        .select(col(df.columns.head).as(s"${pfx}_id"),
          explode(expr(gen(nameCol))).as(s"${pfx}_key"))
    def viable(specs: Seq[(String => String, Int, String => String, Int)])
        : Seq[(DataFrame, DataFrame)] =
      specs.flatMap { case (dGen, dShift, cGen, cShift) =>
        val shared = dLens.map(_ - dShift) intersect cLens.map(_ - cShift)
        if (shared.isEmpty) None
        else Some((
          keys(dirty, "dirty_name", "d", dGen, shared.map(_ + dShift)),
          keys(cust, "c_name", "c", cGen, shared.map(_ + cShift))))
      }
    // (dirty generator, its length shift, cust generator, its shift)
    val cover = viable(Seq(
      (dwWc2, 0, dwWc2, 0),         // δ=0: Hamming ≤ 2
      (dwDel1, 1, dwDel1, 1),       // δ=0: one-char block shift
      (dwDel1wc1, 1, dwWc1, 0),     // δ=1: dirty longer, 1 del + ≤1 sub
      (dwWc1, 0, dwDel1wc1, 1),     // δ=1: cust longer
      (dwDel2, 2, dwSelf, 0),       // δ=2: dirty longer
      (dwSelf, 0, dwDel2, 2)))      // δ=2: cust longer
    val markerSpecs: Seq[((String => String, Int, String => String, Int), Long)] = Seq(
      ((dwSelf, 0, dwSelf, 0), 0L),  // equality → dist 0
      ((dwWc1, 0, dwWc1, 0), 1L),    // δ=0 one substitution
      ((dwSelf, 0, dwDel1, 1), 1L),  // δ=1 cust longer, pure deletion
      ((dwDel1, 1, dwSelf, 0), 1L))  // δ=1 dirty longer
    val markers = markerSpecs.flatMap { case (spec, ub) =>
      viable(Seq(spec)).map { case (dk, ck) => (dk, ck, ub) }
    }
    (cover, markers)
  }

  /** Variable-length / exotic-alphabet fallback: FastSS candidates +
    * an explicit levenshtein ≤ 2 verify over re-attached names. */
  private[graft] def fastssD2Verified(dirty: DataFrame, cust: DataFrame): DataFrame =
    fastssD2Candidates(dirty, cust)
      .join(dirty, "dirty_id")
      .join(cust, "c_custkey")
      .select(col("dirty_id"), col("c_custkey"),
        levenshtein(col("dirty_name"), col("c_name")).cast("long").as("dist"))
      .filter(col("dist") <= 2)

  /** Variable-length fallback — FastSS proper (Bocek et al. 2007):
    * depth-≤2 deletion neighborhoods (name + L one-char deletions +
    * C(L,2) two-char deletions, one array_distinct'd HOF array per
    * record — per-record dedup cut the sf1 join volume 3× because
    * dense zero runs collapse deletion pairs) joined on variant
    * equality. The cover theorem (ed ≤ k ⟹ depth-k neighborhoods
    * intersect) makes this exact for full lev ≤ 2 at ANY length mix;
    * its cost is Σ group² over variant groups, which low-entropy
    * equal-length keyspaces turn quadratic — exactly what the router
    * sends to the fast path instead. */
  /** One side's depth-≤2 deletion-neighborhood keys (exposed for the
    * join-volume degradation spec). */
  private[graft] def fastssVariants(df: DataFrame, nameCol: String,
                                    pfx: String): DataFrame = {
    val id = df.columns.head
    val L = s"length($nameCol)"
    val vs =
      s"""array_distinct(concat(
         |  array($nameCol),
         |  transform(sequence(1, $L), i ->
         |    concat(substr($nameCol, 1, i - 1), substr($nameCol, i + 1))),
         |  flatten(transform(sequence(1, $L - 1), i ->
         |    transform(sequence(i + 1, $L), j ->
         |      concat(substr($nameCol, 1, i - 1),
         |             substr($nameCol, i + 1, j - i - 1),
         |             substr($nameCol, j + 1)))))))""".stripMargin
    df.select(col(id).as(s"${pfx}_id"), explode(expr(vs)).as(s"${pfx}_variant"))
  }

  private[graft] def fastssD2Candidates(dirty: DataFrame, cust: DataFrame): DataFrame =
    fastssVariants(dirty, "dirty_name", "d")
      .join(fastssVariants(cust, "c_name", "c"), col("d_variant") === col("c_variant"))
      .select(col("d_id").as("dirty_id"), col("c_id").as("c_custkey"))
      .distinct()

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
    "er2_entity_resolution_d2" -> fastssD2OracleSql(
      sqlBump(sqlBump("c_name", "c_custkey % 9"),
        "(c_custkey % 9 + 1 + c_custkey % 8) % 9"),
      offset = 2000000L),
    // er3: bump ONE digit + DELETE one other of the LONG composite key
    // (name | 12-hex md5 discriminator, L = 31) — a length-30 dirty
    // side against the 31-char master, graded by the SAME FastSS-shape
    // re-derivation (out-of-range deletion positions are no-op
    // variants DISTINCT collapses, so the fixed-position neighborhood
    // is exact for any ≤31-char length mix).
    "er3_er_mixed_len" -> fastssD2OracleSql(
      sqlDel(sqlBump("c_name", "c_custkey % 9"),
        "(c_custkey % 9 + 1 + c_custkey % 8) % 9"),
      offset = 3000000L,
      masterExpr =
        "c_name || '|' || substr(md5(CAST(c_custkey AS VARCHAR)), 17, 12)",
      maxLen = 31),
    // er4: bump ONE digit + DELETE one other of the SHORT dense key
    // ('K#' + zero-padded 9-digit custkey, L = 11; prefix width 2) —
    // a length-10 dirty side against the 11-char master, graded by
    // the same independent FastSS-shape re-derivation (exact at any
    // length mix; the SPARK side routes del+wildcard).
    "er4_er_short_mixed" -> fastssD2OracleSql(
      sqlDelAt(sqlBumpAt("c_name", "c_custkey % 9", 2),
        "(c_custkey % 9 + 1 + c_custkey % 8) % 9", 2),
      offset = 4000000L,
      masterExpr = "'K#' || lpad(CAST(c_custkey AS VARCHAR), 9, '0')",
      maxLen = 11)
  )

  /** DuckDB digit-bump at digit offset `off` past a `base`-char
    * prefix (er2/er3: base 9 = "Customer#"; er4: base 2 = "K#"). */
  private def sqlBumpAt(inner: String, off: String, base: Int): String =
    s"substr($inner, 1, CAST($base + ($off) AS INT)) " +
      s"|| CAST((CAST(substr($inner, CAST(${base + 1} + ($off) AS INT), 1) AS INT) + 1) % 10 AS VARCHAR) " +
      s"|| substr($inner, CAST(${base + 2} + ($off) AS INT))"

  /** DuckDB digit-delete at digit offset `off` past a `base`-char
    * prefix. */
  private def sqlDelAt(inner: String, off: String, base: Int): String =
    s"substr($inner, 1, CAST($base + ($off) AS INT)) " +
      s"|| substr($inner, CAST(${base + 2} + ($off) AS INT))"

  private def sqlBump(inner: String, off: String): String =
    sqlBumpAt(inner, off, 9)

  private def sqlDel(inner: String, off: String): String =
    sqlDelAt(inner, off, 9)

  /** The FastSS-shape exact lev-≤2 oracle (deletion neighborhoods →
    * variant equi-join → levenshtein verify → ranked resolution),
    * parameterized by the dirty fixture expression, id offset, the
    * master-key expression and its max length — shared by er2
    * (uniform-length plain names) and er3 (mixed-length long keys). */
  private def fastssD2OracleSql(dirtyName: String, offset: Long,
                                masterExpr: String = "c_name",
                                maxLen: Int = NameLen): String = {
    def del1(n: String) =
      s"substr($n, 1, CAST(p.i - 1 AS INT)) || substr($n, CAST(p.i + 1 AS INT))"
    def del2(n: String) =
      s"substr($n, 1, CAST(p.i - 1 AS INT)) " +
        s"|| substr($n, CAST(p.i + 1 AS INT), CAST(p.j - p.i - 1 AS INT)) " +
        s"|| substr($n, CAST(p.j + 1 AS INT))"
    s"""WITH master AS (
       |  SELECT c_custkey, $masterExpr AS c_name FROM customer),
       |dirty AS (
       |  SELECT c_custkey + $offset AS dirty_id,
       |    $dirtyName AS dirty_name
       |  FROM master
       |  WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')),
       |pos1 AS (SELECT unnest(range(1, ${maxLen + 1})) AS i),
       |pos AS (
       |  SELECT ii.i, jj.j
       |  FROM (SELECT unnest(range(1, ${maxLen + 1})) AS i) ii,
       |       (SELECT unnest(range(1, ${maxLen + 1})) AS j) jj
       |  WHERE jj.j > ii.i),
       |ckeys AS (
       |  SELECT DISTINCT c_custkey, c_name, bkey FROM (
       |  SELECT c_custkey, c_name, c_name AS bkey FROM master
       |  UNION ALL
       |  SELECT c.c_custkey, c.c_name,
       |    substr(c.c_name, 1, CAST(p.i - 1 AS INT))
       |      || substr(c.c_name, CAST(p.i + 1 AS INT)) AS bkey
       |  FROM master c, pos1 p
       |  UNION ALL
       |  SELECT c.c_custkey, c.c_name, ${del2("c.c_name")} AS bkey
       |  FROM master c, pos p)),
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
}
