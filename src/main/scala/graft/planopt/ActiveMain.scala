package graft.planopt

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables
import graft.queries.Relational
import graft.workload.{Harvester, WorkloadGen}

/** Active-learning driver — the "active" in active_query_optimizer,
  * end-to-end: from a pool of unlabeled queries, select WHICH to
  * execute/label with the MinHash-LSH + greedy-k-center coreset
  * (M16–M18) over model-derived query features, then compare against
  * labeling a random subset of the same size.
  *
  * Mirrors the reference's intended flow (`coreset.py` consuming the
  * 64-d intermediate features of `model.get_inter_fea`): query
  * features here are the pooled 64-d tree-conv features of each
  * query's default candidate plan under a seed-trained model.
  *
  * Usage: runMain graft.planopt.ActiveMain [sfDir] [poolSize] [budget] [epochs]
  */
object ActiveMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val poolSize = args.lift(1).map(_.toInt).getOrElse(45)
    val budget = args.lift(2).map(_.toInt).getOrElse(16)
    val epochs = args.lift(3).map(_.toInt).getOrElse(60)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val log = new Pipelines.Logger(Some("results/r2_active/log.txt"))
    Tables.registerAll(spark, sfDir)

    // pool + test workload (same generator/seed family as StableMain)
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
        |  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey""".stripMargin)
    val h = WorkloadGen.harvest(spark, seedSql)
    val rd = Harvester.rangeDict(spark, sfDir)
    val gen = WorkloadGen.generateRandomSql(
      h, rd, Harvester.revAliasMap, numSql = poolSize + 10, seed = 99L)
    def q(sql: String): SparkSession => DataFrame =
      s => s.sql(sql.stripSuffix(";"))
    val pool = gen.take(poolSize).zipWithIndex.map { case (s, i) => s"pool$i" -> q(s) }
    val testQ = gen.drop(poolSize).zipWithIndex.map { case (s, i) => s"test$i" -> q(s) } ++
      Seq("j1_join_5way", "j1_join_7way").map(n =>
        n -> ((s: SparkSession) => Relational.defs(n)(s, sfDir)))

    // seed labeled set: first 5 pool queries
    val (seedQ, unlabeled) = pool.splitAt(5)
    log.info(s"pool=${pool.length} seed=${seedQ.length} budget=$budget test=${testQ.length}")
    val seedLabeled = Pipelines.labelWorkload(spark, seedQ, log)
    val (fg0, m0) = Pipelines.train(seedLabeled, epochs = epochs / 2, seed = 53L)

    // 64-d query features: pooled tree-conv feature of the DEFAULT
    // candidate plan under the seed model (get_inter_fea analog)
    def queryFeature(build: SparkSession => DataFrame): Array[Double] = {
      val plan = Candidates.enumerate(spark, build).head.plan
      m0.interFeatures(Seq(fg0.transform(plan)))(0).toArray
    }
    val uFeats = unlabeled.map { case (_, b) => queryFeature(b) }
    val lFeats = seedLabeled.map(lq => {
      m0.interFeatures(Seq(fg0.transform(lq.plans.head)))(0).toArray
    })
    def toMat(rows: Seq[Array[Double]]) = {
      val m = DenseMatrix.zeros[Double](rows.length, rows.head.length)
      rows.zipWithIndex.foreach { case (r, i) =>
        r.indices.foreach(j => m(i, j) = r(j))
      }
      m
    }
    val (uNorm, lNorm) = Coreset.standardizeAndNormalize(toMat(uFeats), toMat(lFeats))

    // arm 1: coreset-selected labeling
    val perGroup = math.max(1, budget / 8)
    val picked = Coreset.select(uNorm, lNorm, numGroups = 8, perGroup = perGroup)
      .take(budget)
    log.info(s"coreset picked ${picked.length}: ${picked.sorted.mkString(",")}")
    val coresetLabeled = Pipelines.labelWorkload(
      spark, picked.map(unlabeled), log)
    val (fgC, mC) = Pipelines.train(seedLabeled ++ coresetLabeled, epochs, seed = 53L)

    // arm 2: random labeling at the same budget
    val rnd = new scala.util.Random(7)
    val randomIdx = rnd.shuffle(unlabeled.indices.toVector).take(picked.length)
    val randomLabeled = Pipelines.labelWorkload(
      spark, randomIdx.map(unlabeled), log)
    val (fgR, mR) = Pipelines.train(seedLabeled ++ randomLabeled, epochs, seed = 53L)

    // evaluate both on the same held-out test set
    val testLabeled = Pipelines.labelWorkload(spark, testQ, log)
    val resC = Pipelines.evaluate(fgC, mC, testLabeled)
    val resR = Pipelines.evaluate(fgR, mR, testLabeled)
    Pipelines.writeLeroDict(resC, "results/r2_active/lero_dict_coreset.json")
    Pipelines.writeLeroDict(resR, "results/r2_active/lero_dict_random.json")
    log.info(s"CORESET: loss=${resC.rankingLoss} " +
      f"selected=${resC.selectedTotalSec}%.3fs default=${resC.defaultTotalSec}%.3fs")
    log.info(s"RANDOM:  loss=${resR.rankingLoss} " +
      f"selected=${resR.selectedTotalSec}%.3fs default=${resR.defaultTotalSec}%.3fs")
    log.close()
    spark.stop()
  }
}
