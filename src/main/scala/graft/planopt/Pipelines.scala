package graft.planopt

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.planopt.PlanFeatures.{FeatureGenerator, PlanNode}

/** End-to-end pipelines (SURVEY.md §2.2 M19/M30/M31): the Spark-
  * native counterparts of the reference's `stable.py:13-30` (train
  * once + test), `Lero/deployment.py:16-46` / `Lero/dynamic.py:23-53`
  * (batched retrain-from-scratch loops), `create_training_file`
  * (M19) and `setup_logger` (M31).
  *
  * Where the reference consumes pre-computed PostgreSQL plan files,
  * this pipeline GENERATES its own candidates (knob sweep,
  * `Candidates`) and labels them by timed execution — the step that
  * fans out to the cluster; everything else is driver-side model
  * work. Evaluation mirrors `lero_test.py:82-155`: Spearman ranking
  * loss over per-query candidate scores, argmin selection, and
  * lero_dict-shaped {qid → selected-plan latency s, "sum" → total}.
  */
object Pipelines {

  /** M31 `setup_logger` (`logger.py:5-33`): console + file. */
  final class Logger(path: Option[String]) {
    private val writer = path.map { p =>
      val f = new java.io.File(p)
      Option(f.getParentFile).foreach(_.mkdirs())
      new java.io.PrintWriter(new java.io.FileWriter(f, true))
    }
    def info(msg: String): Unit = synchronized {
      // synchronized: CV folds log from a thread pool (r15); without
      // it two folds' lines could interleave mid-write in the file
      val line = s"[${java.time.Instant.now()}] $msg"
      println(line)
      writer.foreach { w => w.println(line); w.flush() }
    }
    def close(): Unit = writer.foreach(_.close())
  }

  /** M19 `create_training_file` (`create_training_file.py:4-15`):
    * strip the leading qid field from `#####`-separated plan lines. */
  def createTrainingFile(inPath: String, outPath: String): Unit = {
    val lines = scala.io.Source.fromFile(inPath).getLines().toSeq
    val out = lines.map { line =>
      val arr = line.split("#####")
      arr.drop(1).mkString("#####")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), out.mkString("\n") + "\n")
  }

  /** One query with its labeled candidate plans. */
  final case class LabeledQuery(qid: String, plans: Seq[PlanNode], latenciesMs: Seq[Double])

  /** Enumerate + label candidates for each query (the cluster-side
    * step; at 100 TB you run this at a sampled SF, like the reference
    * labels on a training DB). */
  /** Per-query labeled-candidate cap — see
    * [[Candidates.capCandidates]]. 6 keeps one knob-plan for each of
    * the ≤4 order variants plus two knob alternates of the default
    * order; pair volume per capped query is 30 vs the uncapped 90
    * that made an r14 CV fold cost 37 min. */
  val MaxLabeledPerQuery = 6

  /** Timed executions per candidate label, reduced by MIN (r16
    * verdict #1: single-sample labels pinned the golden's ranking
    * loss to its own relabel noise floor; latency noise is one-sided,
    * so min is the robust estimator — see Candidates.
    * labelCandidatesOrdered). Process-wide via
    * SPARK_GRAFT_LABEL_REPEATS or -Dgraft.label.repeats so BOTH
    * passes of every noise-floor protocol (stable and dynamic) label
    * identically — a floor measured under a cheaper protocol than the
    * labels would understate the labels' noise. */
  val LabelRepeats: Int =
    sys.props.get("graft.label.repeats")
      .orElse(sys.env.get("SPARK_GRAFT_LABEL_REPEATS"))
      .flatMap(_.trim.toIntOption).filter(_ >= 1).getOrElse(1)

  /** Adaptive-escalation ceiling (r17 verdict #1 — push the same-pass
    * floor toward ≤0.15): candidates in an ambiguous pair (relative
    * gap inside Candidates.DefaultGapLo/Hi) are re-sampled up to this
    * many runs per label vector. Defaults to LabelRepeats (escalation
    * off); SPARK_GRAFT_LABEL_ADAPTIVE_MAX=k or
    * -Dgraft.label.adaptiveMax=k engages it. Process-wide like
    * LabelRepeats, and for the same reason: every pass of every
    * noise-floor protocol must label under the protocol it measures. */
  def LabelAdaptiveMax: Int =
    sys.props.get("graft.label.adaptiveMax")
      .orElse(sys.env.get("SPARK_GRAFT_LABEL_ADAPTIVE_MAX"))
      .flatMap(_.trim.toIntOption).filter(_ >= 1).getOrElse(LabelRepeats)

  def labelWorkload(spark: SparkSession,
                    queries: Seq[(String, SparkSession => DataFrame)],
                    log: Logger): Seq[LabeledQuery] =
    queries.map { case (qid, build) =>
      // ORDER-AWARE since r14: the labeled space includes the
      // JoinOrders rewrites the in-engine strategy routes over, so
      // the comparator trains on the candidates it will score (the
      // r13 verdict's >2-candidates-at-the-tail item: 10-way/17-rel
      // joins previously labeled only 2 knob-distinct plans)
      val cands = Candidates.capCandidates(
        Candidates.enumerateOrdered(spark, build), MaxLabeledPerQuery)
      val labeled = Candidates.labelCandidatesOrdered(spark, build, cands,
        repeats = LabelRepeats, adaptiveMaxRepeats = LabelAdaptiveMax)
      log.info(s"$qid: ${cands.length} candidates " +
        s"(${cands.map(_.variantIdx).distinct.length} order variant(s)), " +
        s"latencies=${labeled.map(l => f"${l._2}%.1f").mkString(",")}ms")
      LabeledQuery(qid, labeled.map(_._1.plan), labeled.map(_._2))
    }

  /** [[labelWorkload]] producing TWO label vectors per query from one
    * interleaved pass (see Candidates.labelCandidatesDual): `_1` is
    * the label set (identical protocol and cost to labelWorkload with
    * the same LabelRepeats budget would need two passes); `_2` exists
    * ONLY for the same-pass noise floor. */
  def labelWorkloadDual(spark: SparkSession,
                        queries: Seq[(String, SparkSession => DataFrame)],
                        log: Logger)
      : (Seq[LabeledQuery], Seq[LabeledQuery]) = {
    val both = queries.map { case (qid, build) =>
      val cands = Candidates.capCandidates(
        Candidates.enumerateOrdered(spark, build), MaxLabeledPerQuery)
      val (l1, l2) = Candidates.labelCandidatesDual(spark, build, cands,
        repeats = LabelRepeats, adaptiveMaxRepeats = LabelAdaptiveMax)
      log.info(s"$qid: ${cands.length} candidates " +
        s"(${cands.map(_.variantIdx).distinct.length} order variant(s)), " +
        s"latencies=${l1.map(l => f"${l._2}%.1f").mkString(",")}ms " +
        s"(floor pass: ${l2.map(l => f"${l._2}%.1f").mkString(",")}ms)")
      (LabeledQuery(qid, l1.map(_._1.plan), l1.map(_._2)),
        LabeledQuery(qid, l2.map(_._1.plan), l2.map(_._2)))
    }
    (both.map(_._1), both.map(_._2))
  }

  /** All-ordered-pairs training tensors for `labeled` under a FIXED
    * featurizer (`lero_train.py:26-40` pairing). */
  private def trainingTensors(trainable: Seq[LabeledQuery], fg: FeatureGenerator):
      (IndexedSeq[PlanFeatures.FeatTree], IndexedSeq[PlanFeatures.FeatTree],
        IndexedSeq[Double], IndexedSeq[Double]) = {
    val x1 = scala.collection.mutable.ArrayBuffer[PlanFeatures.FeatTree]()
    val x2 = scala.collection.mutable.ArrayBuffer[PlanFeatures.FeatTree]()
    val y1 = scala.collection.mutable.ArrayBuffer[Double]()
    val y2 = scala.collection.mutable.ArrayBuffer[Double]()
    trainable.foreach { q =>
      val trees = q.plans.map(fg.transform)
      val labels = q.latenciesMs.map(fg.normLabel)
      Ranking.trainingPairs(trees.indices).foreach { case (i, j) =>
        x1 += trees(i); x2 += trees(j)
        y1 += labels(i); y2 += labels(j)
      }
    }
    (x1.toIndexedSeq, x2.toIndexedSeq, y1.toIndexedSeq, y2.toIndexedSeq)
  }

  /** Train a pairwise comparator on labeled queries
    * (`lero_train.py:76-106` flow: fit featurizer on all plans +
    * exec times, all-ordered-pairs per query, pairwise BCE). */
  def train(labeled: Seq[LabeledQuery], epochs: Int = 100,
            seed: Long = 17L,
            opTypes: Vector[String] = PlanFeatures.OpTypes): (FeatureGenerator, LeroModelPairWise) = {
    val trainable = labeled.filter(_.plans.length >= 2)
    require(trainable.nonEmpty, "no query has >=2 candidates")
    val allPlans = trainable.flatMap(_.plans)
    val allTimes = trainable.flatMap(_.latenciesMs)
    val fg = FeatureGenerator.fit(allPlans, allTimes, opTypes)
    val (x1, x2, y1, y2) = trainingTensors(trainable, fg)
    val model = new LeroModelPairWise(fg.featureDim, seed)
    model.fit(x1, x2, y1, y2, epochs = epochs)
    (fg, model)
  }

  /** Fine-tune an EXISTING comparator on new labels — the reference's
    * `tuning_model_path` mode (`lero_train.py:77-88`: load the saved
    * model, REUSE its feature_generator, continue `fit` from the
    * current weights). The featurizer is frozen deliberately: vocab
    * and normalizer bounds travel with the artifact ([[ModelIO]]),
    * so features stay comparable across refreshes. Combined with
    * [[costWorkload]] this is the full cold-start lifecycle: pretrain
    * on cost labels, deploy, then fine-tune as the first runtime
    * labels arrive — spec'd to beat training from scratch on the
    * same few runtime labels. Mutates and returns `model`. */
  def finetune(fg: FeatureGenerator, model: LeroModelPairWise,
               labeled: Seq[LabeledQuery], epochs: Int = 100): LeroModelPairWise = {
    val trainable = labeled.filter(_.plans.length >= 2)
    require(trainable.nonEmpty, "no query has >=2 candidates")
    require(model.featureDim == fg.featureDim,
      s"model dim ${model.featureDim} != featurizer dim ${fg.featureDim}")
    val (x1, x2, y1, y2) = trainingTensors(trainable, fg)
    model.fit(x1, x2, y1, y2, epochs = epochs)
    model
  }

  // ---- pretrain-on-cost (`lero_train.py:91-94`, pretrain=True) ----

  /** Analytic physical-plan cost — the Spark stand-in for the PG
    * `Plan.Total Cost` label the reference pretrains on BEFORE any
    * runtime labels exist (cold start). Physical variants of one
    * logical plan share every intermediate cardinality, so a pure
    * C_out (Σ rows) cannot rank them; the discriminating terms are
    * physical: shuffle exchanges move rows over the wire, sorts pay a
    * comparison log-factor, broadcast builds ship to every executor,
    * nested-loop/cartesian blow up. Each node contributes
    * rows·weight(op). Absolute magnitudes are irrelevant downstream —
    * labels are log-min-max normalized and the comparator only
    * consumes order. */
  def planCost(p: PlanNode): Double = {
    val rows = math.max(p.rowsEst, 1.0)
    val self = p.opType match {
      case "ShuffleExchange" => 3.0 * rows
      case "BroadcastExchange" => 2.0 * rows
      case "Sort" => rows * (math.log(rows + 1) / math.log(2))
      case "SortMergeJoin" | "ShuffledHashJoin" | "BroadcastHashJoin" => rows
      case "BroadcastNestedLoopJoin" | "CartesianProduct" => 100.0 * rows
      case _ => rows
    }
    self + p.children.map(planCost).sum
  }

  /** Enumerate candidates and label them with [[planCost]] — planning
    * only, NO execution (the cluster never runs a query). The result
    * reuses [[LabeledQuery]] with cost units in `latenciesMs`, so
    * [[train]] and [[evaluate]] consume it unchanged — exactly the
    * reference's pretrain flow, where cost labels ride the same
    * pairwise loss as runtime labels. */
  def costWorkload(spark: SparkSession,
                   queries: Seq[(String, SparkSession => DataFrame)],
                   log: Logger = new Logger(None)): Seq[LabeledQuery] =
    queries.map { case (qid, build) =>
      // DELIBERATELY knob-only (not enumerateOrdered): the analytic
      // cost discriminates PHYSICAL operator choice, but ranking
      // join-ORDER variants is cardinality-driven and the gate-SF
      // estimates are too flat to order them (measured r14: cost
      // labels over order variants ANTI-correlate with runtime,
      // Spearman loss 1.4 — worse than random init). Cold-start
      // covers the knob axis; order discrimination is owned by the
      // runtime-label path (labelWorkload, order-aware).
      val cands = Candidates.enumerate(spark, build)
      val costs = cands.map(c => planCost(c.plan))
      log.info(s"$qid: ${cands.length} candidates, " +
        s"costs=${costs.map(c => f"$c%.0f").mkString(",")}")
      LabeledQuery(qid, cands.map(_.plan), costs)
    }

  /** Pointwise rank-score training (`training_with_rank_score`,
    * `lero_train.py:49-52` + M13 [[Ranking.rankScore]]): per query,
    * sort candidates by label (cost in pretrain mode, runtime
    * otherwise), regress `rankScore(rank)` with the pointwise net.
    * Rank scores are log-min-max normalized through the featurizer's
    * label path like every other label in this codebase. */
  def trainPointwiseRankScore(labeled: Seq[LabeledQuery],
                              scoreType: Int = 0, epochs: Int = 100,
                              seed: Long = 17L,
                              opTypes: Vector[String] = PlanFeatures.OpTypes): (FeatureGenerator, LeroModelPointWise) = {
    val trainable = labeled.filter(_.plans.length >= 2)
    require(trainable.nonEmpty, "no query has >=2 candidates")
    val ranked = trainable.map { q =>
      val order = q.latenciesMs.zipWithIndex.sortBy(_._1).map(_._2)
      val rankOf = order.zipWithIndex
        .map { case (cand, r) => cand -> Ranking.rankScore(r + 1, scoreType) }
        .toMap
      (q.plans, q.plans.indices.map(rankOf))
    }
    val allPlans = ranked.flatMap(_._1)
    val allScores = ranked.flatMap(_._2)
    val fg = FeatureGenerator.fit(allPlans, allScores, opTypes)
    val model = new LeroModelPointWise(fg.featureDim, seed)
    model.fit(allPlans.map(fg.transform).toIndexedSeq,
      allScores.map(fg.normLabel).toIndexedSeq, epochs = epochs)
    (fg, model)
  }

  /** [[Ranking.snapResolutionTies]] over positionally-paired dual
    * label sets (same queries, same candidate lists): returns both
    * sets with sub-resolution ties snapped to equality per query. The
    * SELECTED/DEFAULT latency totals must always be computed from the
    * RAW labels — snapping is an ordering-resolution statement, not a
    * latency correction. */
  def snapResolution(l1: Seq[LabeledQuery], l2: Seq[LabeledQuery],
                     eps: Double = Ranking.TieSnapEps)
      : (Seq[LabeledQuery], Seq[LabeledQuery]) = {
    require(l1.length == l2.length)
    val snapped = l1.zip(l2).map { case (a, b) =>
      require(a.qid == b.qid && a.latenciesMs.length == b.latenciesMs.length,
        s"dual label sets misaligned at ${a.qid}/${b.qid}")
      val (s1, s2) = Ranking.snapResolutionTies(a.latenciesMs, b.latenciesMs, eps)
      (a.copy(latenciesMs = s1), b.copy(latenciesMs = s2))
    }
    (snapped.map(_._1), snapped.map(_._2))
  }

  // ---- Bayesian margin gate (r17 verdict #2: the stock-conf E2E arm
  // paid a ~10.8% routing tax because the chooser deviates from the
  // session-native plan even when its predicted gain is inside its own
  // uncertainty) ----

  /** Calibration record for the route/decline gate. `threshold` is on
    * the z-score (P(native slower) − 0.5)/σ from the Bayesian head
    * (M15, `model.py:400-412` — the reference's uncertainty output,
    * dead code there, live here); `scoreGapThreshold` is on the main
    * comparator's score delta score(native) − score(best) — its
    * predicted GAIN MAGNITUDE in normalized-label units. Both must
    * clear for a route: z alone transfers badly across deployment
    * confs (r18 measured: an overhead-charged z-only threshold that
    * fixed the stock-conf tax also declined half the defensive-conf
    * broadcast wins, whose gains are 15× larger but whose z is
    * moderate); the gain axis is conf-invariant because the score
    * units are the model's own. The rest is the train-split evidence
    * the thresholds were chosen on. */
  final case class GateCalibration(threshold: Double, nPairs: Int,
                                   nRouted: Int, netGainMs: Double,
                                   gainAllMs: Double,
                                   scoreGapThreshold: Double = 0.0)

  /** Pick the gate threshold maximizing the REALIZED net routing gain
    * on the train split: pairs is (z, gainMs) per query where the main
    * comparator proposes a non-default plan; threshold t routes
    * exactly the pairs with z > t. `overheadMs` is charged per routed
    * query — the engine-side cost of routing itself (replan under the
    * remembered choice on every repeat; the r18 E2E(A) measured it at
    * ~40 ms/routed query at sf0.1) — so a pick whose predicted gain
    * does not clear BOTH the model's uncertainty and the routing cost
    * declines; without it the r17/r18 stock-conf arm routed hundreds
    * of ~20 ms-gain queries and paid ~40 ms each (the "routing tax").
    * Ties prefer the LARGER t (route less — the no-lose direction);
    * t is clamped ≥ 0 so the gate never routes on a sub-coin-flip
    * prediction. Pure; unit-tested. */
  private[graft] def calibrateThreshold(pairs: Seq[(Double, Double)],
                                        overheadMs: Double = 0.0)
      : (Double, Double) = {
    if (pairs.isEmpty) return (0.0, 0.0)
    val cands = (0.0 +: pairs.map(_._1).filter(_ > 0)).distinct
    cands.map { t =>
      (t, pairs.collect { case (z, g) if z > t => g - overheadMs }.sum)
    }.maxBy { case (t, net) => (net, t) }
  }

  /** Two-axis gate calibration over (z, scoreGap, gainMs) triples:
    * jointly pick the (zThr, gapThr) maximizing the overhead-charged
    * net gain of routing exactly the pairs clearing BOTH. Candidate
    * thresholds are 0 plus the observed values on each axis; ties
    * prefer the more conservative (larger) pair. The gap axis is what
    * transfers across deployment confs — see [[GateCalibration]].
    * Pure; unit-tested. */
  private[graft] def calibrateThreshold2(
      triples: Seq[(Double, Double, Double)], overheadMs: Double = 0.0)
      : (Double, Double, Double) = {
    if (triples.isEmpty) return (0.0, 0.0, 0.0)
    val zCands = (0.0 +: triples.map(_._1).filter(_ > 0)).distinct
    val gCands = (0.0 +: triples.map(_._2).filter(_ > 0)).distinct
    val best = (for (zt <- zCands; gt <- gCands) yield {
      val net = triples.collect {
        case (z, g, gain) if z > zt && g > gt => gain - overheadMs
      }.sum
      (zt, gt, net)
    }).maxBy { case (zt, gt, net) => (net, zt + gt) }
    best
  }

  /** Train the uncertainty-aware pairwise comparator (M15) on the same
    * labeled corpus as the main model and calibrate the margin gate's
    * threshold against the main model's own routing proposals: for
    * each train query where the main comparator's argmin is NOT the
    * default plan, score the (default, proposed) pair with the
    * Bayesian head, form z = (P(default slower) − 0.5)/σ, and choose
    * the threshold that maximizes realized net gain. Deployed via
    * [[ModelIO.saveGate]] → `plans.PlanChoice`: the in-engine strategy
    * routes only when z clears the threshold, otherwise it declines
    * and the session plans natively — the no-lose guarantee at stock
    * conf that the r17 E2E(A) arm lacked. */
  /** Per-routed-query overhead charged during gate calibration
    * (SPARK_GRAFT_GATE_OVERHEAD_MS / -Dgraft.gate.overheadMs). The
    * r18 E2E(A) measured ~40 ms of replanning per routed repeat at
    * sf0.1; at production input sizes the same 40 ms is noise against
    * seconds-scale queries, so the constant is a per-deployment knob,
    * not a universal truth. */
  def GateOverheadMs: Double =
    sys.props.get("graft.gate.overheadMs")
      .orElse(sys.env.get("SPARK_GRAFT_GATE_OVERHEAD_MS"))
      .flatMap(_.trim.toDoubleOption).filter(_ >= 0).getOrElse(0.0)

  /** The (z, scoreGap, gainMs) calibration triples for the gate: for
    * each labeled query where `mainModel`'s argmin is NOT the default
    * plan, the Bayesian z-score of (default, proposed), the main
    * model's predicted-gain score delta, and the realized label gain
    * of routing. */
  def gatePairs(labeled: Seq[LabeledQuery], fg: FeatureGenerator,
                mainModel: LeroModelPairWise, bm: BayesianModelPairWise)
      : Seq[(Double, Double, Double)] =
    labeled.filter(_.plans.length >= 2).flatMap { q =>
      val trees = q.plans.map(fg.transform)
      val scores = mainModel.predict(trees)
      val best = scores.indices.minBy(scores)
      if (best == 0) None
      else {
        val (p, v) = bm.predictPair(trees(0), trees(best))
        val z = (p - 0.5) / math.sqrt(math.max(v, 1e-12))
        Some((z, scores(0) - scores(best),
          q.latenciesMs(0) - q.latenciesMs(best)))
      }
    }

  def trainBayesGate(labeled: Seq[LabeledQuery], fg: FeatureGenerator,
                     mainModel: LeroModelPairWise, epochs: Int = 60,
                     seed: Long = 23L, log: Logger = new Logger(None))
      : (BayesianModelPairWise, GateCalibration) = {
    val trainable = labeled.filter(_.plans.length >= 2)
    require(trainable.nonEmpty, "no query has >=2 candidates")
    val (x1, x2, y1, y2) = trainingTensors(trainable, fg)
    val bm = new BayesianModelPairWise(fg.featureDim, seed)
    bm.fit(x1, x2, y1, y2, epochs = epochs)
    val pairs = gatePairs(trainable, fg, mainModel, bm)
    val overhead = GateOverheadMs
    val (thr, gapThr, net) = calibrateThreshold2(pairs, overhead)
    val cal = GateCalibration(thr, pairs.size,
      pairs.count(t => t._1 > thr && t._2 > gapThr), net,
      pairs.map(_._3).sum, gapThr)
    log.info(f"bayes gate calibration: z threshold=${cal.threshold}%.4f, " +
      f"score-gap threshold=${cal.scoreGapThreshold}%.5f " +
      f"(overhead charge ${overhead}%.1fms/routed) routes " +
      f"${cal.nRouted}/${cal.nPairs} proposed deviations on train " +
      f"(net gain ${cal.netGainMs}%.1fms gated vs ${cal.gainAllMs}%.1fms ungated)")
    (bm, cal)
  }

  /** Evaluation result (`lero_test.py:82-155`). */
  final case class EvalResult(rankingLoss: Option[Double],
                              leroDict: Map[String, Double],
                              selectedTotalSec: Double,
                              defaultTotalSec: Double)

  /** Evaluate on labeled queries: score candidates, Spearman ranking
    * loss, argmin selection vs candidate-0 default (the reference's
    * PG baseline, `lero_test.py:56-78`). */
  def evaluate(fg: FeatureGenerator, model: LeroModelPairWise,
               testSet: Seq[LabeledQuery]): EvalResult = {
    val scored = testSet.filter(_.plans.length >= 2).map { q =>
      val scores = model.predict(q.plans.map(fg.transform)).toSeq
      (q, scores)
    }
    val loss = Ranking.rankingLoss(scored.map(_._2), scored.map(_._1.latenciesMs))
    val dict = scala.collection.mutable.LinkedHashMap[String, Double]()
    var sum = 0.0
    var defSum = 0.0
    scored.foreach { case (q, scores) =>
      val pick = scores.indices.minBy(scores)
      val sec = q.latenciesMs(pick) / 1000.0
      dict(q.qid) = sec
      sum += sec
      defSum += q.latenciesMs.head / 1000.0
    }
    EvalResult(loss, dict.toMap, sum, defSum)
  }

  /** lero_dict.json writer (`lero_test.py:99-112` layout). */
  def writeLeroDict(result: EvalResult, path: String): Unit = {
    val entries = result.leroDict.map { case (k, v) => s"""  "$k": $v""" } ++
      Seq(s"""  "sum": ${result.selectedTotalSec}""")
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.writeString(f.toPath,
      entries.mkString("{\n", ",\n", "\n}\n"))
  }

  /** Everything the stable pipeline produced — the result plus the
    * trained artifacts, so callers can deploy the model in-engine
    * (`plans.PlanChoice.install`). */
  final case class StableArtifacts(result: EvalResult, fg: FeatureGenerator,
                                   model: LeroModelPairWise,
                                   testLabeled: Seq[LabeledQuery],
                                   trainLabeled: Seq[LabeledQuery],
                                   testFloorLabels: Seq[LabeledQuery] = Nil)

  /** M30 stable pipeline (`stable.py:13-30`): label, train on the
    * train split, evaluate on the test split. */
  def stable(spark: SparkSession,
             trainQueries: Seq[(String, SparkSession => DataFrame)],
             testQueries: Seq[(String, SparkSession => DataFrame)],
             epochs: Int = 100, seed: Long = 17L,
             log: Logger = new Logger(None)): EvalResult =
    stableWithModel(spark, trainQueries, testQueries, epochs, seed, log).result

  /** `stable` variant returning the trained model for deployment.
    * With `dualTestFloor` the test split is labeled via
    * [[labelWorkloadDual]] and the second (same-pass) label vectors
    * ride in `testFloorLabels` so the caller can state the labeling
    * protocol's own noise floor. */
  def stableWithModel(spark: SparkSession,
                      trainQueries: Seq[(String, SparkSession => DataFrame)],
                      testQueries: Seq[(String, SparkSession => DataFrame)],
                      epochs: Int = 100, seed: Long = 17L,
                      log: Logger = new Logger(None),
                      dualTestFloor: Boolean = false): StableArtifacts = {
    val trainLabeled = labelWorkload(spark, trainQueries, log)
    val (testLabeled, testFloor) =
      if (dualTestFloor) labelWorkloadDual(spark, testQueries, log)
      else (labelWorkload(spark, testQueries, log), Nil)
    val (fg, model) = train(trainLabeled, epochs, seed)
    val res = evaluate(fg, model, testLabeled)
    log.info(s"ranking loss: ${res.rankingLoss}")
    log.info(f"total latency: selected=${res.selectedTotalSec}%.3fs " +
      f"default=${res.defaultTotalSec}%.3fs")
    StableArtifacts(res, fg, model, testLabeled, trainLabeled, testFloor)
  }

  /** k-fold CV over an already-labeled corpus (labels are the
    * expensive part — execution — so folds only re-train/re-score):
    * per-fold held-out Spearman ranking losses. A single split's loss
    * is seed-cherry-pickable (r3 verdict: ±0.24 swing on 182
    * queries); the fold mean±sd is the split-independent number. */
  def cvRankingLosses(labeled: Seq[LabeledQuery], folds: Int = 5,
                      epochs: Int = 100, seed: Long = 17L,
                      log: Logger = new Logger(None)): Seq[Double] = {
    val eligible = new scala.util.Random(seed)
      .shuffle(labeled.filter(_.plans.length >= 2))
    val blocks = eligible.zipWithIndex.groupBy(_._2 % folds)
      .toSeq.sortBy(_._1).map(_._2.map(_._1))
    // Folds retrain on already-paid labels — pure driver-side CPU
    // (breeze math, per-instance state only), so they run CONCURRENTLY
    // on a bounded pool. Each fold's training is bit-deterministic
    // given (fold data, seed); parallelism changes only wall clock and
    // log interleaving (Logger.info is synchronized). At the r15
    // 300-query corpus a fold retrains in ~35 min — 5 sequential folds
    // would dominate the pipeline; 5 concurrent ones cost one fold.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(folds, Runtime.getRuntime.availableProcessors()))
    try {
      val futures = blocks.indices.map { i =>
        pool.submit(new java.util.concurrent.Callable[Double] {
          def call(): Double = {
            val (ffg, fm) = train(
              blocks.indices.filter(_ != i).flatMap(blocks), epochs, seed)
            val r = evaluate(ffg, fm, blocks(i))
            val loss = r.rankingLoss.getOrElse(Double.NaN)
            log.info(f"cv fold $i%d: held-out loss=$loss%.4f " +
              f"(test=${blocks(i).size}%d queries)")
            loss
          }
        })
      }
      try futures.map(_.get())
      catch { case e: Throwable =>
        // a failed fold must not leave the sibling folds (~minutes of
        // training each) running on non-daemon threads while the
        // exception propagates — cancel them and tear the pool down
        futures.foreach(_.cancel(true))
        pool.shutdownNow()
        throw e
      }
    } finally pool.shutdown()
  }

  /** M30 deployment/dynamic loop (`deployment.py:20-43`,
    * `dynamic.py:27-50`): per batch i, retrain FROM SCRATCH on batch
    * i and evaluate on batch i+1; returns per-batch selected-plan
    * totals (the reference's lero_latency_list). */
  def deploymentLoop(batches: Seq[Seq[LabeledQuery]], epochs: Int = 100,
                     seed: Long = 17L,
                     log: Logger = new Logger(None)): Seq[Double] =
    deploymentLoopResults(batches, epochs, seed, log).map(_.selectedTotalSec)

  /** [[deploymentLoop]] with the full per-batch evaluations (loss and
    * default totals alongside the selected totals) — what an E2E
    * driver reports; the reference's lero_latency_list keeps only the
    * selected sums.
    *
    * With `bootstrap = true` (the dynamic mode, `Lero/dynamic.py:27-38`)
    * the list additionally starts with a model_0 entry: a model trained
    * on ONLY THE FIRST labeled query of batch 0 (the reference writes
    * the first LINE of the first plan file as `train_0`) evaluated on
    * batch 0 itself — so the emitted list has exactly `batches.length`
    * entries and is shape-comparable with the reference's
    * `lero_dynamic_latency_list` artifact. The deployment mode
    * (`Lero/deployment.py:16-46`) has no bootstrap and emits
    * `batches.length - 1` entries.
    *
    * With `accumulate = true` (the deployment.py-style accumulating
    * mode, r9 verdict #5) model_i is trained on ALL labeled batches
    * 0..i rather than batch i alone — the training corpus grows with
    * the stream, trading drift-tolerance for label volume. The
    * reference's `train_{i}` harvest files are cumulative per
    * exploration run in that mode, so the Spark-native analog is a
    * growing flatten of the labeled batches (labels are still paid
    * once per batch; only training re-runs). */
  def deploymentLoopResults(batches: Seq[Seq[LabeledQuery]],
                            epochs: Int = 100, seed: Long = 17L,
                            log: Logger = new Logger(None),
                            bootstrap: Boolean = false,
                            accumulate: Boolean = false): Seq[EvalResult] =
    deploymentLoopResultsFull(batches, epochs, seed, log, bootstrap,
      accumulate).map(_._1)

  /** [[deploymentLoopResults]] additionally returning each batch's
    * trained artifacts, so a driver can re-score the batch under a
    * different evaluation metric (the r18 resolution-qualified loss)
    * without retraining. */
  def deploymentLoopResultsFull(batches: Seq[Seq[LabeledQuery]],
                                epochs: Int = 100, seed: Long = 17L,
                                log: Logger = new Logger(None),
                                bootstrap: Boolean = false,
                                accumulate: Boolean = false)
      : Seq[(EvalResult, FeatureGenerator, LeroModelPairWise)] = {
    val boot = if (bootstrap && batches.nonEmpty && batches.head.nonEmpty) {
      val (fg0, model0) = train(batches.head.take(1), epochs, seed)
      val res0 = evaluate(fg0, model0, batches.head)
      log.info(f"bootstrap model_0 (1-query train) eval on batch 0: " +
        f"loss=${res0.rankingLoss} sum=${res0.selectedTotalSec}%.3fs")
      Seq((res0, fg0, model0))
    } else Nil
    boot ++ batches.indices.drop(1).map { i =>
      val trainSet =
        if (accumulate) batches.take(i).flatten else batches(i - 1)
      val (fg, model) = train(trainSet, epochs, seed)
      val res = evaluate(fg, model, batches(i))
      log.info(f"batch eval (train=${trainSet.size} queries" +
        (if (accumulate) s", batches 0..${i - 1} accumulated" else "") +
        f"): loss=${res.rankingLoss} sum=${res.selectedTotalSec}%.3fs")
      (res, fg, model)
    }
  }
}
