package graft.planopt

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables
import graft.queries.Relational
import graft.workload.{Harvester, WorkloadGen}

/** End-to-end stable-pipeline driver (the reference's `stable.py`
  * entry point, Spark-native): harvest metadata → generate a workload
  * → enumerate + time-label candidate plans → train the pairwise
  * comparator → evaluate ranking loss + selected-vs-default latency
  * on held-out queries. Artifacts land in `results/` (log +
  * lero_dict.json), comparable in shape to the reference's committed
  * `results/stats/` goldens (BASELINE.md ranking loss 0.6132 on its
  * STATS corpus — different data, same metric).
  *
  * Usage: runMain graft.planopt.StableMain [sfDir] [numGenerated] [epochs]
  */
object StableMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val numGen = args.lift(1).map(_.toInt).getOrElse(24)
    val epochs = args.lift(2).map(_.toInt).getOrElse(60)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val log = new Pipelines.Logger(Some("results/r2_stable/log.txt"))
    Tables.registerAll(spark, sfDir)

    // seed workload: the join-bearing relational shapes
    val seedNames = Seq("j1_join_2way", "j1_join_5way", "j1_join_7way",
      "a2_min_join", "q2_join_group_topn")
    val seedSql = Seq(
      """SELECT count(*) FROM orders o, customer c
        |WHERE o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'""".stripMargin,
      """SELECT count(*) FROM lineitem l, orders o, customer c, supplier s, nation n
        |WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        |  AND l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
        |  AND c.c_acctbal > 0 AND l.l_quantity < 30""".stripMargin,
      """SELECT count(*) FROM lineitem l, orders o, customer c, supplier s,
        |  nation n, region r, part p
        |WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        |  AND l.l_suppkey = s.s_suppkey AND l.l_partkey = p.p_partkey
        |  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
        |  AND r.r_name = 'ASIA' AND p.p_size BETWEEN 1 AND 25""".stripMargin)

    // M20-M26: harvest + generate
    log.info(s"harvesting metadata from $sfDir")
    val h = WorkloadGen.harvest(spark, seedSql)
    val rd = Harvester.rangeDict(spark, sfDir)
    Harvester.writeInfos(spark, sfDir, "results/r2_stable/infos", seedSql)
    val generated = WorkloadGen.generateRandomSql(
      h, rd, Harvester.revAliasMap, numSql = numGen, seed = 42L)
    log.info(s"generated $numGen workload queries")

    val genQueries: Seq[(String, SparkSession => DataFrame)] =
      generated.zipWithIndex.map { case (q, i) =>
        s"gen$i" -> ((s: SparkSession) => s.sql(q.stripSuffix(";")))
      }
    val fixedQueries: Seq[(String, SparkSession => DataFrame)] =
      seedNames.map(n => n -> ((s: SparkSession) => Relational.defs(n)(s, sfDir)))

    val all = fixedQueries ++ genQueries
    val (trainQ, testQ) = all.splitAt((all.length * 0.7).toInt)
    log.info(s"train=${trainQ.length} test=${testQ.length} queries; epochs=$epochs")

    val res = Pipelines.stable(spark, trainQ, testQ, epochs = epochs,
      seed = 17L, log = log)
    Pipelines.writeLeroDict(res, "results/r2_stable/lero_dict.json")
    log.info(s"ranking_loss=${res.rankingLoss.getOrElse(Double.NaN)} " +
      f"selected=${res.selectedTotalSec}%.3fs default=${res.defaultTotalSec}%.3fs " +
      "(reference STATS golden: 0.6132 ranking loss, different corpus)")
    log.close()
    spark.stop()
  }
}
