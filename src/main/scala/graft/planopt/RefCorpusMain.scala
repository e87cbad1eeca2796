package graft.planopt

/** Train + evaluate the pairwise comparator on the reference's OWN
  * committed plan corpus (`Lero/dynamic_data/stats_simplified/
  * train_{0,1}`, PG EXPLAIN JSON), with the reference's PG op
  * vocabulary — the apples-to-apples check against the committed
  * golden (ranking loss 0.6132, `results/log.txt:5`; rerun 0.6107).
  *
  * Caveats on comparability (stated up front, per the corpus itself):
  * the reference's golden evaluated a 137-query STATS TEST plan
  * corpus that is NOT committed to the repo (`results/stats/
  * lero_dict.json` has 137 q-entries; `data/test/stats_simplified
  * .txt` is SQL text, not plans), and its training file had 2511
  * pairs vs the 487 committed here. So the strictest reproducible
  * protocol is: train on a 70% split of the committed corpus,
  * report Spearman ranking loss on the held-out 30% (plus the
  * train-split loss for reference). Same corpus family, same
  * featurization vocabulary, same metric (`lero_test.py:115-155`),
  * same pairing (`lero_train.py:26-40`).
  *
  * Usage: runMain graft.planopt.RefCorpusMain [corpusDir] [epochs] [outDir] [trainFrac]
  */
object RefCorpusMain {
  def main(args: Array[String]): Unit = {
    val corpusDir = args.lift(0).getOrElse(
      "/root/reference/Lero/dynamic_data/stats_simplified")
    val epochs = args.lift(1).map(_.toInt).getOrElse(100)
    val outDir = args.lift(2).getOrElse("results/r3_refcorpus")
    val trainFrac = args.lift(3).map(_.toDouble).getOrElse(0.7)
    val log = new Pipelines.Logger(Some(s"$outDir/log.txt"))

    val labeled = Seq("train_0", "train_1").flatMap { f =>
      val p = new java.io.File(corpusDir, f)
      if (p.isFile && p.length() > 0) {
        val qs = PgPlanImporter.loadCorpus(p.getPath)
        log.info(s"$f: ${qs.size} queries, " +
          s"${qs.map(_.plans.size).sum} candidate plans")
        qs
      } else { log.info(s"$f: absent/empty, skipped"); Nil }
    }
    require(labeled.nonEmpty, s"no corpus lines under $corpusDir")

    val trainable = labeled.filter(_.plans.size >= 2)
    val nPairs = trainable.map(q => q.plans.size * (q.plans.size - 1) / 2).sum
    log.info(s"corpus: ${trainable.size} queries with >=2 candidates, " +
      s"$nPairs ordered pairs (reference training run used 2511, log.txt:1)")

    // deterministic 70/30 split (same seed policy as StableMain)
    val shuffled = new scala.util.Random(17L).shuffle(trainable)
    val (trainQ, testQ) = shuffled.splitAt((shuffled.size * trainFrac).toInt)
    log.info(s"split: train=${trainQ.size} test=${testQ.size}; epochs=$epochs; " +
      s"op vocabulary = PG (${PlanFeatures.PgOpTypes.size} ops)")

    val (fg, model) = Pipelines.train(trainQ, epochs = epochs, seed = 17L,
      opTypes = PlanFeatures.PgOpTypes)
    log.info(s"featureDim=${fg.featureDim} " +
      s"(ops=${fg.opTypes.size}, tables=${fg.inputRelations.size}+1, +2)")

    val testRes = Pipelines.evaluate(fg, model, testQ)
    val trainRes = Pipelines.evaluate(fg, model, trainQ)
    Pipelines.writeLeroDict(testRes, s"$outDir/lero_dict.json")
    log.info(s"HELD-OUT ranking loss: ${testRes.rankingLoss.getOrElse(Double.NaN)} " +
      s"(reference committed golden on its uncommitted 137-query test set: 0.6132)")
    log.info(s"train-split ranking loss: ${trainRes.rankingLoss.getOrElse(Double.NaN)}")
    log.info(f"held-out selected latency=${testRes.selectedTotalSec}%.3fs " +
      f"vs candidate-0 default=${testRes.defaultTotalSec}%.3fs")

    // k-fold cross-validation (r4; r3 verdict: with 182 queries a
    // single split swings the held-out loss ±0.24 — 0.827 @70/30 vs
    // 0.589 @85/15 — so any one split is cherry-pickable. The fold
    // mean±sd is the split-independent comparison against the golden.)
    val k = 5
    val blocks = shuffled.zipWithIndex.groupBy(_._2 % k)
      .toSeq.sortBy(_._1).map(_._2.map(_._1))
    val foldLosses = blocks.indices.map { i =>
      val foldTest = blocks(i)
      val foldTrain = blocks.indices.filter(_ != i).flatMap(blocks)
      val (ffg, fm) = Pipelines.train(foldTrain, epochs = epochs, seed = 17L,
        opTypes = PlanFeatures.PgOpTypes)
      val r = Pipelines.evaluate(ffg, fm, foldTest)
      val loss = r.rankingLoss.getOrElse(Double.NaN)
      log.info(f"fold $i%d: held-out loss=$loss%.4f " +
        f"(test=${foldTest.size}%d queries, selected=${r.selectedTotalSec}%.1fs " +
        f"default=${r.defaultTotalSec}%.1fs)")
      loss
    }
    // divide by the folds actually run (== k only when blocks == k;
    // a tiny corpus can yield fewer) — Pipelines.cvRankingLosses
    // callers use .size, and the twins must report the same mean
    val mean = foldLosses.sum / foldLosses.size
    // sample sd over the folds ACTUALLY run (a tiny corpus can yield
    // fewer than k); one fold has no spread to report
    val sd =
      if (foldLosses.size < 2) 0.0
      else math.sqrt(foldLosses.map(l => (l - mean) * (l - mean)).sum /
        (foldLosses.size - 1))
    log.info(f"${foldLosses.size}%d-fold held-out ranking loss: " +
      f"mean=$mean%.4f sd=$sd%.4f " +
      "(reference committed golden: 0.6132; lower is better)")
    log.close()
  }
}
