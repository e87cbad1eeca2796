package graft.planopt

import org.apache.spark.sql.SparkSession

import graft.engine.Tables

/** Standalone SAME-PASS noise-floor measurement over the stable
  * pipeline's held-out test split (r17): reconstructs the identical
  * pool-striped workload and 70% split as a StableMain run, dual-labels
  * the first `takeN` held-out queries (two interleaved label vectors
  * from ONE pass — Candidates.labelCandidatesDual), and reports the
  * run1-vs-run2 ranking loss.
  *
  * Exists because the r17 1000-query golden exposed that the old
  * relabel-later floor conflates label noise with cross-phase JVM
  * drift: its post-training relabel ran ~30% faster systematically and
  * produced floor 0.2397, while the labels' own near-tie structure
  * (3 of 113 two-candidate test queries within 5%) predicts ~0.05.
  * This main measures the drift-free floor for THAT golden's test
  * split without re-running the 2.5 h pipeline; StableMain itself
  * reports the same-pass floor natively from r17 on.
  *
  * Usage: FloorProbeMain [sfDir] [numGen] [takeN] [outDir] [poolFile]
  * — sfDir/numGen/poolFile must match the golden being probed.
  */
object FloorProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val numGen = args.lift(1).map(_.toInt).getOrElse(1000)
    val takeN = args.lift(2).map(_.toInt).getOrElse(150)
    val outDir = args.lift(3).getOrElse("results/r17_floorprobe")
    val poolFile = args.lift(4).getOrElse("results/r14_pool/train_pool.txt")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val log = new Pipelines.Logger(Some(s"$outDir/log.txt"))
    Tables.registerAll(spark, sfDir)
    val (_, testQ) = StableMain.assembleWorkload(sfDir,
      StableMain.poolSample(poolFile, numGen, log))
    val probe = testQ.take(takeN)
    log.info(s"same-pass floor probe: ${probe.size} of ${testQ.size} " +
      s"held-out queries at $sfDir, label_repeats=${Pipelines.LabelRepeats} " +
      "(dual interleaved min-of-k)")
    val (l1, l2) = Pipelines.labelWorkloadDual(spark, probe, log)
    val floor = Ranking.rankingLoss(
      l2.map(_.latenciesMs), l1.map(_.latenciesMs))
    log.info(f"SAME-PASS noise floor over ${l1.size} held-out queries: " +
      f"${floor.getOrElse(Double.NaN)}%.4f (cross-phase relabel drift " +
      "on the full split measured 0.2397 in results/r17_stable_1000 — " +
      "the delta is JVM-phase drift, not label noise)")
    val (s1, s2) = Pipelines.snapResolution(l1, l2)
    val snapFloor = Ranking.rankingLoss(
      s2.map(_.latenciesMs), s1.map(_.latenciesMs))
    log.info(f"resolution-qualified floor (measured ties within " +
      f"eps=${Ranking.TieSnapEps} snapped to equality): " +
      f"${snapFloor.getOrElse(Double.NaN)}%.4f — the floor on " +
      "RESOLVABLE order; the raw number above additionally counts " +
      "tie-order flips no sf0.1 sample count resolves")
    log.close()
    spark.stop()
  }
}
