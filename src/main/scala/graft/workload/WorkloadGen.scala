package graft.workload

import scala.util.Random

import org.apache.spark.sql.SparkSession

import graft.workload.Harvester._

/** Synthetic SQL workload generators (SURVEY.md §2.2 M24–M28) — the
  * Spark-native ports of the reference's STATS/IMDB query synthesis:
  *  - condition harvest + empirical (#joins, #filters) distributions
  *    (`/root/reference/create_sql.py:12-92`);
  *  - join graph + connected-join BFS sampling
  *    (`create_sql.py:253-323`);
  *  - COUNT(*) comma-FROM SQL with one filter per join-key
  *    equivalence class (union-find), numeric ops weighted
  *    [1,7,7,7,7,7], string =/!= (`create_sql.py:95-251`,
  *    `generate_stats_sql.py:86-223`);
  *  - template filter-refresh mode: keep a template's joins + SELECT,
  *    regenerate filters with ops =/!=/LIKE/IN weighted 1:13:13:13
  *    (`generate_imdb_sql.py:196-332`);
  *  - template structural matcher (tables, select list, join set,
  *    filter columns — `sql_template.py:5-54,153-194`).
  *
  * All generation is seeded driver-side work over harvested metadata
  * (the expensive part — harvesting — is distributed; synthesis of
  * even 40k query strings is microseconds per query).
  */
object WorkloadGen {

  /** Empirical distribution (values, weights) — `Counter` in the
    * reference. */
  final case class Dist(values: Seq[Int], weights: Seq[Int]) {
    require(values.nonEmpty && values.length == weights.length,
      s"Dist needs matching non-empty values/weights (got ${values.length}/" +
        s"${weights.length}) — an empty distribution usually means the seed " +
        "workload had no queries of the counted kind (e.g. no multi-table joins)")
    def sample(rnd: Random): Int = weightedChoice(values, weights, rnd)
  }

  /** M24: harvest join conditions, filter columns, and the empirical
    * distributions from a seed workload. */
  final case class Harvest(joinConditions: Set[String],
                           filterColumns: Set[String],
                           numJoinsDist: Dist, numFiltersDist: Dist)

  def harvest(spark: SparkSession, seedWorkload: Seq[String]): Harvest = {
    val joins = Harvester.joinConditions(spark, seedWorkload)
    val fcols = Harvester.filterColumns(spark, seedWorkload)
      .flatMap { case (a, cs) => cs.map(c => s"$a.$c") }.toSet
    // per-query counts for the distributions
    val perQuery = seedWorkload.map { sql =>
      val (j, f) = Harvester.separateConditions(spark, sql)
      (j.length, f.length)
    }
    def distOf(xs: Seq[Int]): Dist = {
      val counter = xs.groupBy(identity).view.mapValues(_.size).toMap
      val vals = counter.keys.toSeq.sorted
      Dist(vals, vals.map(counter))
    }
    Harvest(joins, fcols,
      distOf(perQuery.map(_._1).filter(_ > 0)),
      distOf(perQuery.map(_._2)))
  }

  /** M25 `build_join_graph`: alias adjacency from join conditions. */
  def buildJoinGraph(joinConditions: Set[String]): Map[String, Set[String]] = {
    val g = scala.collection.mutable.Map[String, Set[String]]().withDefaultValue(Set())
    joinConditions.foreach { cond =>
      val Array(l, r) = cond.split("=")
      val lt = l.trim.split("\\.")(0)
      val rt = r.trim.split("\\.")(0)
      g(lt) = g(lt) + rt
      g(rt) = g(rt) + lt
    }
    g.toMap
  }

  /** M25 `generate_connected_joins`: BFS random walk emitting a
    * connected join subset of size ≤ numJoins. */
  def generateConnectedJoins(graph: Map[String, Set[String]], numJoins: Int,
                             joinConditions: Set[String], rnd: Random): (Seq[String], Set[String]) = {
    if (graph.isEmpty) return (Nil, Set())
    val keys = graph.keys.toSeq.sorted
    val start = keys(rnd.nextInt(keys.length))
    // one set: the BFS frontier IS the emitted FROM-table set (two
    // parallel sets here once invited silent desynchronization)
    val visited = scala.collection.mutable.Set(start)
    val joins = scala.collection.mutable.ArrayBuffer[String]()
    val queue = scala.collection.mutable.Queue[(String, String)]()
    graph(start).toSeq.sorted.foreach(n => queue.enqueue((start, n)))
    while (joins.length < numJoins && queue.nonEmpty) {
      val (cur, neighbor) = queue.dequeue()
      if (!visited(neighbor)) {
        val conds = joinConditions.toSeq.sorted.filter { cond =>
          val Array(l, r) = cond.split("=").map(_.trim)
          (l.startsWith(s"$cur.") && r.startsWith(s"$neighbor.")) ||
            (l.startsWith(s"$neighbor.") && r.startsWith(s"$cur."))
        }
        if (conds.nonEmpty) {
          joins += conds(rnd.nextInt(conds.length))
          visited += neighbor
          graph(neighbor).toSeq.sorted
            .filterNot(visited).foreach(n => queue.enqueue((neighbor, n)))
        }
      }
    }
    (joins.toSeq, visited.toSet)
  }

  /** Union-find over join columns — one filter per equivalence class
    * (`create_sql.py:138-166`; semantically Catalyst constraint
    * propagation). */
  private final class DSU {
    private val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    def union(x: String, y: String): Unit = {
      val (px, py) = (find(x), find(y))
      if (px != py) parent(py) = px
    }
  }

  private val NumericOps = Seq("=", "!=", ">", "<", ">=", "<=")
  private val NumericWeights = Seq(1, 7, 7, 7, 7, 7) // create_sql.py:213

  private def weightedChoice[A](items: Seq[A], weights: Seq[Int], rnd: Random): A = {
    val cum = weights.scanLeft(0)(_ + _).tail
    // draw ONCE, then scan: an inline `rnd.nextInt(...) < _` inside
    // indexWhere re-draws per element, which warps the distribution
    // to P(i) = (1-Σp_<i)·p_i-ish — the r14 pool-stats TV gate caught
    // exactly that (uniform {1,4,6} sampled as 0.33/0.44/0.22)
    val r = rnd.nextInt(cum.last)
    items(cum.indexWhere(r < _))
  }

  /** String-literal escape for the SPARK parser the generated
    * workloads run on (labeling executes candidates in-session; these
    * queries are not DuckDB-oracle-gated): backslash first — Spark's
    * default parser treats \ as an escape inside literals, so a
    * harvested value ending in \ would swallow the closing quote and
    * break the generated SQL — then the standard '' doubling. */
  private def escapeQuotes(v: String): String =
    v.replace("\\", "\\\\").replace("'", "''")

  private def tsLiteral(epochSec: Long): String = {
    val inst = java.time.Instant.ofEpochSecond(epochSec)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    s"TIMESTAMP '${fmt.format(inst)}'"
  }

  /** One random filter condition for `alias.col` from the harvested
    * range (`create_sql.py:204-236` value sampling). */
  private def randomFilter(aliasCol: String, range: ColRange, rnd: Random): Option[String] =
    range match {
      case NumRange(lo, hi, integral) =>
        val op = weightedChoice(NumericOps, NumericWeights, rnd)
        val v =
          // floorMod, not abs-mod: abs(Long.MinValue) is NEGATIVE, so
          // the 2^-64 draw would emit an out-of-domain literal
          if (integral && lo != hi)
            (lo.toLong + java.lang.Math.floorMod(rnd.nextLong(),
              math.max(1, (hi - lo).toLong + 1))).toString
          else BigDecimal(lo + rnd.nextDouble() * (hi - lo))
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
        Some(s"$aliasCol $op $v")
      case TsRange(lo, hi) =>
        val op = weightedChoice(Seq(">", "<", ">=", "<="), Seq(1, 1, 1, 1), rnd)
        val v = lo + (if (hi > lo)
          java.lang.Math.floorMod(rnd.nextLong(), hi - lo) else 0L)
        Some(s"$aliasCol $op ${tsLiteral(v)}")
      case StrValues(vs) if vs.nonEmpty =>
        val op = if (rnd.nextBoolean()) "=" else "!="
        Some(s"$aliasCol $op '${escapeQuotes(vs(rnd.nextInt(vs.length)))}'")
      case _ => None
    }

  /** M26 `generate_random_sql`: COUNT(*) comma-FROM queries over
    * connected join subgraphs with one filter per equivalence class.
    */
  def generateRandomSql(h: Harvest, rangeDict: Map[String, Map[String, ColRange]],
                        revAlias: Map[String, String], numSql: Int,
                        seed: Long = 42L): Seq[String] = {
    val rnd = new Random(seed)
    val graph = buildJoinGraph(h.joinConditions)
    (0 until numSql).map { _ =>
      val numJoins = h.numJoinsDist.sample(rnd)
      val (joins, tables) = generateConnectedJoins(graph, numJoins, h.joinConditions, rnd)
      val fromClause = tables.toSeq.sorted
        .map(a => s"${revAlias(a)} AS $a").mkString(", ")
      val where = scala.collection.mutable.ArrayBuffer[String]()
      val dsu = new DSU
      joins.foreach { j =>
        val Array(l, r) = j.split("=").map(_.trim)
        dsu.union(l, r)
        where += s"$l = $r"
      }
      // one filter per equivalence class (create_sql.py:171-236)
      val numFilters = (h.numFiltersDist.sample(rnd) * 0.5).toInt + 1
      val available = rnd.shuffle(h.filterColumns.toSeq.sorted)
      val usedClasses = scala.collection.mutable.Set[String]()
      var count = 0
      available.foreach { fc =>
        if (count < numFilters) {
          val alias = fc.split("\\.")(0)
          val colName = fc.split("\\.")(1)
          if (tables(alias) && !usedClasses(dsu.find(fc))) {
            rangeDict.get(alias).flatMap(_.get(colName))
              .flatMap(rg => randomFilter(fc, rg, rnd)).foreach { cond =>
                where += cond
                usedClasses += dsu.find(fc)
                count += 1
              }
          }
        }
      }
      s"SELECT COUNT(*) FROM $fromClause WHERE ${where.mkString(" AND ")};"
    }
  }

  // --- M27: template filter-refresh (IMDB mode) -----------------------

  private val RefreshOps = Seq("=", "!=", "LIKE", "IN")
  private val RefreshWeights = Seq(1, 13, 13, 13) // generate_imdb_sql.py:255
  // num_conditions ~ {2..6} weighted 1:3:3:2:1 (generate_imdb_sql.py:351)
  private val RefreshCounts = Seq(2, 3, 4, 5, 6)
  private val RefreshCountWeights = Seq(1, 3, 3, 2, 1)

  /** One IMDB-mode filter on `aliasCol` (`generate_imdb_sql.py:240-275`
    * multi-alias branch, `:296-331` fallback branch). Numeric ops are
    * UNIFORM over =/!=/>/</>=/<= (unlike the STATS generator's 1:7:…
    * weights); string ops are =/!=/LIKE/IN weighted 1:13:13:13.
    *
    * `capMinusOne` selects the multi-alias branch's IN shape: a
    * 2-value domain degrades IN to `=` (`:248-251`) and the sample
    * size caps at `len(col_info)-1` (`:253`) — the fallback branch
    * caps at `len(col_info)` with no degrade (`:302`). */
  private def imdbFilter(aliasCol: String, range: ColRange, rnd: Random,
                         capMinusOne: Boolean): Option[String] =
    range match {
      case StrValues(vs) if vs.nonEmpty =>
        weightedChoice(RefreshOps, RefreshWeights, rnd) match {
          case "IN" if capMinusOne && vs.length <= 2 =>
            Some(s"$aliasCol = '${escapeQuotes(vs(rnd.nextInt(vs.length)))}'")
          case "IN" =>
            val cap = if (capMinusOne) math.min(7, vs.length - 1)
                      else math.min(7, vs.length)
            // randint(2, cap) inclusive; cap >= 2 is guaranteed by the
            // degrade above (capMinusOne) or nonEmpty+fallback (len>=2
            // required for any 2-sample; a 1-value domain yields '=')
            if (cap < 2)
              Some(s"$aliasCol = '${escapeQuotes(vs(rnd.nextInt(vs.length)))}'")
            else {
              val k = 2 + rnd.nextInt(cap - 1)
              val picked = rnd.shuffle(vs).take(k).map(v => s"'${escapeQuotes(v)}'")
              Some(s"$aliasCol IN (${picked.mkString(", ")})")
            }
          case "LIKE" =>
            val v = vs(rnd.nextInt(vs.length))
            Some(s"$aliasCol LIKE '%${escapeQuotes(v.take(2))}%'")
          case op => Some(s"$aliasCol $op '${escapeQuotes(vs(rnd.nextInt(vs.length)))}'")
        }
      case NumRange(lo, hi, integral) =>
        val op = NumericOps(rnd.nextInt(NumericOps.length)) // uniform, :243
        val v =
          if (integral && lo != hi)
            (lo.toLong + java.lang.Math.floorMod(rnd.nextLong(),
              math.max(1, (hi - lo).toLong + 1))).toString
          else BigDecimal(lo + rnd.nextDouble() * (hi - lo))
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
        Some(s"$aliasCol $op $v")
      case rg => randomFilter(aliasCol, rg, rnd) // TsRange etc.
    }

  /** Regenerate a template's filters, keeping its joins and SELECT
    * (`generate_imdb_sql.py:196-332`): 2–6 filters (weighted 1:3:3:2:1),
    * ops weighted 1:13:13:13 (LIKE patterns from the first 2 chars of a
    * harvested value, IN lists of 2–7 sampled values).
    *
    * Tables appearing under MULTIPLE aliases are handled first
    * (`:214-279`): one shared filter column is drawn per such table and
    * a per-alias condition is generated on it for EVERY alias — the
    * correlated-alias shape that makes JOB-style self-alias templates
    * (`movie_info` under mi1/mi2) selective. Remaining slots fall back
    * to random columns from the template (`:281-332`).
    *
    * @param filterColumns harvested per-TABLE filter columns (the
    *   reference's `filter_columns` infos file); when empty, derived
    *   from the template's own filter columns via its alias map. */
  /** NOTE the `rangeDict` KEY CONTRACT: keys are the template's
    * ALIASES (o1/o2/…), not table names — a multi-alias template
    * needs per-alias entries so each alias can draw its own value.
    * `Harvester.rangeDict` returns TABLE-keyed maps; callers re-key
    * through the template's alias map first (the specs show the
    * shape). A missing alias key silently yields no filter for that
    * alias, so a table-keyed map here produces a joins-only query. */
  def refreshTemplateFilters(spark: SparkSession, templateSql: String,
                             rangeDict: Map[String, Map[String, ColRange]],
                             rnd: Random,
                             filterColumns: Map[String, Seq[String]] = Map.empty): String = {
    val (joins, _) = Harvester.separateConditions(spark, templateSql)
    val comp = extractComponents(spark, templateSql)
    val whereMatch = "(?i)\\bWHERE\\b".r.findFirstMatchIn(templateSql)
    require(whereMatch.isDefined, "template needs WHERE")
    // the rebuild emits head + WHERE + regenerated conjuncts — a tail
    // clause after the WHERE block (GROUP BY/HAVING/ORDER BY/LIMIT)
    // would be silently DROPPED, changing the query's shape. The
    // reference's JOB templates are SELECT..FROM..WHERE only
    // (generate_imdb_sql.py:196-332), so reject out-of-scope
    // templates loudly instead of corrupting them.
    val tail = templateSql.substring(whereMatch.get.end)
    require(!"(?i)\\b(GROUP\\s+BY|HAVING|ORDER\\s+BY|LIMIT)\\b".r
        .findFirstIn(tail).isDefined,
      "template has a post-WHERE clause (GROUP BY/HAVING/ORDER BY/" +
        "LIMIT) the filter refresh would drop — out of the reference " +
        "template shape")
    val head = templateSql.substring(0, whereMatch.get.start).trim
    val aliasToTable = comp.fromTables.map { case (t, a) => a -> t }.toMap
    // per-table filter columns: harvested if given, else the template's
    // own filter columns grouped through its alias map
    val fcolsByTable: Map[String, Seq[String]] =
      if (filterColumns.nonEmpty) filterColumns
      else comp.filterColumns.toSeq.sorted.flatMap { fc =>
        val Array(a, c) = fc.split("\\.", 2)
        aliasToTable.get(a).map(_ -> c)
      }.groupMap(_._1)(_._2)
    val numFilters = weightedChoice(RefreshCounts, RefreshCountWeights, rnd)
    val filters = scala.collection.mutable.ArrayBuffer[String]()
    val used = scala.collection.mutable.Set[String]()

    // Phase 1 (generate_imdb_sql.py:214-279): per-alias conditions on
    // one shared column for each table with multiple aliases.
    val tableAliases: Seq[(String, Seq[String])] = comp.fromTables
      .groupMap(_._1)(_._2).toSeq.sortBy(_._1)
    tableAliases.filter(_._2.length > 1).foreach { case (table, aliases) =>
      if (filters.length < numFilters) {
        val shared = fcolsByTable.getOrElse(table, Nil).distinct
        if (shared.nonEmpty) {
          val sharedCol = shared(rnd.nextInt(shared.length))
          aliases.foreach { alias =>
            val column = s"$alias.$sharedCol"
            if (filters.length < numFilters && !used(column)) {
              rangeDict.get(alias).flatMap(_.get(sharedCol))
                .flatMap(rg => imdbFilter(column, rg, rnd, capMinusOne = true))
                .foreach { c => filters += c; used += column }
            }
          }
        }
      }
    }

    // Phase 2 (generate_imdb_sql.py:281-332): remaining slots from
    // random unused template columns.
    val available = rnd.shuffle(comp.filterColumns.toSeq.sorted)
    available.foreach { fc =>
      if (filters.length < numFilters && !used(fc)) {
        val Array(alias, colName) = fc.split("\\.", 2)
        val inHarvest = aliasToTable.get(alias).forall { t =>
          fcolsByTable.getOrElse(t, Nil).contains(colName)
        }
        if (inHarvest) {
          rangeDict.get(alias).flatMap(_.get(colName))
            .flatMap(rg => imdbFilter(fc, rg, rnd, capMinusOne = false))
            .foreach { c => filters += c; used += fc }
        }
      }
    }
    val conds = joins.map(j => j.replace("(", "").replace(")", "")) ++ filters
    s"$head WHERE ${conds.mkString(" AND ")}"
  }

  // --- M28: template structural matching ------------------------------

  /** Structural signature (`sql_template.py:5-54`): tables, select
    * list, join set, filter columns, plus the ordered (table, alias)
    * FROM pairs (the reference's `components['from_tables']`,
    * needed by the multi-alias refresh phase). */
  final case class Components(tables: Set[String], select: Seq[String],
                              joins: Set[String], filterColumns: Set[String],
                              fromTables: Seq[(String, String)] = Nil)

  def extractComponents(spark: SparkSession, sql: String): Components = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
    val tables = plan.collect {
      case SubqueryAlias(id, _: UnresolvedRelation) => id.name.toLowerCase
      case r: UnresolvedRelation => r.multipartIdentifier.last.toLowerCase
    }.toSet
    // ordered (table, alias) pairs; an unaliased relation is its own
    // alias (matches the reference's from_tables)
    def fromPairs(p: LogicalPlan): Seq[(String, String)] = p match {
      case SubqueryAlias(id, r: UnresolvedRelation) =>
        Seq((r.multipartIdentifier.last.toLowerCase, id.name.toLowerCase))
      case r: UnresolvedRelation =>
        val t = r.multipartIdentifier.last.toLowerCase
        Seq((t, t))
      case other => other.children.flatMap(fromPairs)
    }
    val fromTables = fromPairs(plan)
    val select = plan.collectFirst {
      case p: Project => p.projectList.map(_.sql)
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.map(_.sql)
    }.getOrElse(Nil)
    val (joins, filters) = Harvester.separateConditions(spark, sql)
    val filterCols = filters.flatMap { fsql =>
      "\\b([a-z]\\w*)\\.(\\w+)".r.findAllMatchIn(fsql.toLowerCase)
        .map(m => s"${m.group(1)}.${m.group(2)}")
    }.toSet
    Components(tables, select, joins.map(_.toLowerCase.replace(" ", "")).toSet,
      filterCols, fromTables)
  }

  /** `compare_queries` (`sql_template.py:153-175`): (structure match,
    * full match incl. filter columns). */
  def compareQueries(t: Components, q: Components): (Boolean, Boolean) = {
    if (t.tables != q.tables) (false, false)
    else if (t.select != q.select) (false, false)
    else if (t.joins != q.joins) (false, false)
    else if (t.filterColumns != q.filterColumns) (true, false)
    else (true, true)
  }

  /** `find_matching_template` (`sql_template.py:177-194`). */
  def findMatchingTemplate(spark: SparkSession, querySql: String,
                           templates: Seq[String]): Option[(Int, Boolean)] = {
    val qc = extractComponents(spark, querySql)
    templates.zipWithIndex.iterator.flatMap { case (t, i) =>
      val (structural, full) = compareQueries(extractComponents(spark, t), qc)
      if (structural) Some((i, full)) else None
    }.nextOption()
  }
}
