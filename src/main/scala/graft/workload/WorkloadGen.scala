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
    require(values.nonEmpty && values.length == weights.length)
    private val cum = weights.scanLeft(0)(_ + _).tail
    def sample(rnd: Random): Int = {
      val x = rnd.nextInt(cum.last)
      values(cum.indexWhere(x < _))
    }
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
    val visited = scala.collection.mutable.Set(start)
    val tables = scala.collection.mutable.Set(start)
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
          tables += neighbor
          visited += neighbor
          graph(neighbor).toSeq.sorted
            .filterNot(visited).foreach(n => queue.enqueue((neighbor, n)))
        }
      }
    }
    (joins.toSeq, tables.toSet)
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
    items(cum.indexWhere(rnd.nextInt(cum.last) < _))
  }

  private def escapeQuotes(v: String): String = v.replace("'", "''")

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
          if (integral && lo != hi) (lo.toLong + math.abs(rnd.nextLong()) % math.max(1, (hi - lo).toLong + 1)).toString
          else BigDecimal(lo + rnd.nextDouble() * (hi - lo))
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
        Some(s"$aliasCol $op $v")
      case TsRange(lo, hi) =>
        val op = weightedChoice(Seq(">", "<", ">=", "<="), Seq(1, 1, 1, 1), rnd)
        val v = lo + (if (hi > lo) math.abs(rnd.nextLong()) % (hi - lo) else 0L)
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

  /** Regenerate a template's filters, keeping its joins and SELECT
    * (`generate_imdb_sql.py:196-332`): 2–6 filters, ops weighted
    * 1:13:13:13 (LIKE patterns from the first 2 chars of a harvested
    * value, IN lists of 2–7 sampled values). */
  def refreshTemplateFilters(spark: SparkSession, templateSql: String,
                             rangeDict: Map[String, Map[String, ColRange]],
                             rnd: Random): String = {
    val (joins, _) = Harvester.separateConditions(spark, templateSql)
    val comp = extractComponents(spark, templateSql)
    val whereMatch = "(?i)\\bWHERE\\b".r.findFirstMatchIn(templateSql)
    require(whereMatch.isDefined, "template needs WHERE")
    val head = templateSql.substring(0, whereMatch.get.start).trim
    val candidateCols = comp.filterColumns.toSeq.sorted
    val numFilters = 2 + rnd.nextInt(5)
    val filters = rnd.shuffle(candidateCols).take(numFilters).flatMap { fc =>
      val Array(alias, colName) = fc.split("\\.")
      rangeDict.get(alias).flatMap(_.get(colName)).flatMap {
        case StrValues(vs) if vs.nonEmpty =>
          weightedChoice(RefreshOps, RefreshWeights, rnd) match {
            case "LIKE" =>
              val v = vs(rnd.nextInt(vs.length))
              Some(s"$fc LIKE '%${escapeQuotes(v.take(2))}%'")
            case "IN" =>
              val k = 2 + rnd.nextInt(math.min(6, vs.length))
              val picked = rnd.shuffle(vs).take(k).map(v => s"'${escapeQuotes(v)}'")
              Some(s"$fc IN (${picked.mkString(", ")})")
            case op => Some(s"$fc $op '${escapeQuotes(vs(rnd.nextInt(vs.length)))}'")
          }
        case rg => randomFilter(fc, rg, rnd)
      }
    }
    val conds = joins.map(j => j.replace("(", "").replace(")", "")) ++ filters
    s"$head WHERE ${conds.mkString(" AND ")}"
  }

  // --- M28: template structural matching ------------------------------

  /** Structural signature (`sql_template.py:5-54`): tables, select
    * list, join set, filter columns. */
  final case class Components(tables: Set[String], select: Seq[String],
                              joins: Set[String], filterColumns: Set[String])

  def extractComponents(spark: SparkSession, sql: String): Components = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.plans.logical.{Project, SubqueryAlias}
    val tables = plan.collect {
      case SubqueryAlias(id, _: UnresolvedRelation) => id.name.toLowerCase
      case r: UnresolvedRelation => r.multipartIdentifier.last.toLowerCase
    }.toSet
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
    Components(tables, select, joins.map(_.toLowerCase.replace(" ", "")).toSet, filterCols)
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
