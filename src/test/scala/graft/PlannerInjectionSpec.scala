package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.planopt.{Candidates, LeroModelPairWise, PlanFeatures}
import graft.plans.PlanChoice
import graft.queries.Relational

/** In-engine learned plan choice (SURVEY §7.4): a session built with
  * GraftExtensions must TRANSPARENTLY execute the physical variant the
  * pairwise comparator scores best — same user code, model-chosen
  * plan — and the results must equal the base session's. */
class PlannerInjectionSpec extends AnyFunSuite {
  import SparkTestSession._

  /** A fresh session wired through GraftExtensions on the shared
    * SparkContext (builder path a user would configure with
    * `spark.sql.extensions=graft.engine.GraftExtensions`). */
  private def withExtensionSession[T](body: SparkSession => T): T = {
    spark // force base session (and its SparkContext) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        // pin plans for deterministic assertions (AQE may re-plan)
        .config("spark.sql.adaptive.enabled", "false")
        // sf0.001 inputs are far below the default 4 MB size bypass;
        // these tests exercise routing itself, so disable the bypass
        // (its own behavior has a dedicated test below)
        .config(PlanChoice.MinInputBytesKey, "0")
        .withExtensions(new graft.engine.GraftExtensions)
        .getOrCreate()
      try body(s2)
      finally {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("extension session executes the model-chosen physical variant") {
    // train-side artifacts from the BASE session (no extensions — the
    // strategy must not fire during enumeration)
    val build = (s: SparkSession) => Relational.defs("j1_join_2way")(s, sf)
    val cands = Candidates.enumerate(spark, build)
    assert(cands.size >= 2, "need plan diversity for a meaningful choice")
    val gen = PlanFeatures.FeatureGenerator.fit(cands.map(_.plan))
    val model = new LeroModelPairWise(gen.featureDim, seed = 29)
    val baseResult = build(spark).collect()(0).getLong(0)

    PlanChoice.install(model, gen)
    try withExtensionSession { s2 =>
      graft.engine.Tables.registerAll(s2, sf)
      PlanChoice.lastChoice.set(None)
      val df = Relational.defs("j1_join_2way")(s2, sf)
      val got = df.collect()(0).getLong(0)
      // 1) transparent correctness: same result as the base session
      assert(got == baseResult)
      // 2) the strategy actually fired and scored multiple candidates
      val choice = PlanChoice.lastChoice.get()
      assert(choice.isDefined, "LearnedPlanStrategy never fired")
      assert(choice.get.nCandidates >= 2)
      assert(choice.get.scores.size == choice.get.nCandidates)
      // 3) the EXECUTED plan is the argmin candidate, provably: its
      // canonical form equals the recorded chosen canonical
      val executedCanonical =
        Candidates.canonicalKey(df.queryExecution.executedPlan)
      assert(executedCanonical == choice.get.canonical,
        s"executed plan is not the chosen candidate:\n$executedCanonical\nvs\n${choice.get.canonical}")
      // 4) argmin semantics (lero_test.py:97): chosen index minimizes score
      val scores = choice.get.scores
      assert(scores.indices.minBy(scores) ==
        scores.indexOf(scores.min))
      // 5) steady state: the repeat query hits the choice cache —
      // same knob choice, single planning (nCandidates == 1), and the
      // executed plan still equals the originally chosen candidate
      PlanChoice.lastChoice.set(None)
      val df2 = Relational.defs("j1_join_2way")(s2, sf)
      assert(df2.collect()(0).getLong(0) == baseResult)
      val cachedChoice = PlanChoice.lastChoice.get()
      assert(cachedChoice.isDefined)
      assert(cachedChoice.get.nCandidates == 1, "expected choice-cache hit")
      assert(cachedChoice.get.knobLabel == choice.get.knobLabel)
      assert(Candidates.canonicalKey(df2.queryExecution.executedPlan)
        == choice.get.canonical)
    } finally PlanChoice.uninstall()
  }

  test("write commands route the query subtree, never the command") {
    // regression: firing on a v2 write root made the nested planning
    // EXECUTE the write per knob and featurize the constant
    // CommandResult (identical scores for every candidate)
    val build = (s: SparkSession) => Relational.defs("j1_join_2way")(s, sf)
    val cands = Candidates.enumerate(spark, build)
    val gen = PlanFeatures.FeatureGenerator.fit(cands.map(_.plan))
    PlanChoice.install(new LeroModelPairWise(gen.featureDim, seed = 41), gen)
    try withExtensionSession { s2 =>
      graft.engine.Tables.registerAll(s2, sf)
      PlanChoice.lastChoice.set(None)
      Relational.defs("j1_join_2way")(s2, sf)
        .write.format("noop").mode("overwrite").save()
      val choice = PlanChoice.lastChoice.get()
      assert(choice.isDefined, "strategy did not fire for the write's query subtree")
      // the chosen plan is the QUERY (has a join), not a command shell
      assert(choice.get.canonical.contains("Join"), choice.get.canonical)
      assert(!choice.get.canonical.contains("OverwriteByExpression") &&
        !choice.get.canonical.contains("noop-table"),
        s"swept the write command itself: ${choice.get.canonical.linesIterator.next()}")
      // a repeated identical write must hit the choice cache — the
      // command's canonical embeds raw exprIds that change per run, so
      // caching under it (the original bug) could never hit
      PlanChoice.lastChoice.set(None)
      Relational.defs("j1_join_2way")(s2, sf)
        .write.format("noop").mode("overwrite").save()
      val second = PlanChoice.lastChoice.get()
      assert(second.isDefined)
      assert(second.get.nCandidates == 1,
        "second write of the same query re-swept instead of hitting the cache")
    } finally PlanChoice.uninstall()
  }

  test("size bypass skips the sweep for tiny inputs and is conf-tunable") {
    val build = (s: SparkSession) => Relational.defs("j1_join_2way")(s, sf)
    val cands = Candidates.enumerate(spark, build)
    val gen = PlanFeatures.FeatureGenerator.fit(cands.map(_.plan))
    PlanChoice.install(new LeroModelPairWise(gen.featureDim, seed = 7), gen)
    try withExtensionSession { s2 =>
      graft.engine.Tables.registerAll(s2, sf)
      // restore the default bypass threshold: sf0.001 inputs (<1 MB)
      // are far below 4 MB, so the strategy must decline
      s2.conf.set(PlanChoice.MinInputBytesKey,
        PlanChoice.DefaultMinInputBytes.toString)
      PlanChoice.lastChoice.set(None)
      val before = PlanChoice.bypassCount.get()
      val n = Relational.defs("j1_join_2way")(s2, sf).collect()(0).getLong(0)
      assert(n > 0)
      assert(PlanChoice.lastChoice.get().isEmpty,
        "tiny query was routed despite the size bypass")
      assert(PlanChoice.bypassCount.get() > before, "bypass not counted")
      // drop the threshold: the same query now routes
      s2.conf.set(PlanChoice.MinInputBytesKey, "0")
      PlanChoice.lastChoice.set(None)
      Relational.defs("j1_join_2way")(s2, sf).collect()
      assert(PlanChoice.lastChoice.get().isDefined,
        "query did not route with the bypass disabled")
    } finally PlanChoice.uninstall()
  }

  test("installFrom loads a saved model directory and routes with it") {
    val build = (s: SparkSession) => Relational.defs("j1_join_2way")(s, sf)
    val cands = Candidates.enumerate(spark, build)
    val gen = PlanFeatures.FeatureGenerator.fit(cands.map(_.plan))
    val model = new LeroModelPairWise(gen.featureDim, seed = 61)
    val dir = java.nio.file.Files.createTempDirectory("graft_install").toString
    graft.planopt.ModelIO.save(dir, model, gen)
    PlanChoice.uninstall()
    PlanChoice.installFrom(dir) // deployment path: no retraining
    try withExtensionSession { s2 =>
      graft.engine.Tables.registerAll(s2, sf)
      PlanChoice.lastChoice.set(None)
      val df = Relational.defs("j1_join_2way")(s2, sf)
      df.collect()
      val choice = PlanChoice.lastChoice.get()
      assert(choice.isDefined, "loaded model did not route")
      // the loaded net is bit-identical to the saved one: same scores
      val expected = model.predict(cands.map(c => gen.transform(c.plan)))
      val loaded = PlanChoice.current.get
      val got = loaded._1.predict(cands.map(c => loaded._2.transform(c.plan)))
      assert(expected.sameElements(got))
    } finally PlanChoice.uninstall()
  }

  test("strategy is dormant without an installed model") {
    PlanChoice.uninstall()
    withExtensionSession { s2 =>
      graft.engine.Tables.registerAll(s2, sf)
      PlanChoice.lastChoice.set(None)
      val n = Relational.defs("j1_join_2way")(s2, sf).collect()(0).getLong(0)
      assert(n > 0)
      assert(PlanChoice.lastChoice.get().isEmpty, "strategy fired with no model")
    }
  }

  test("kill-switch conf disables routing even with a model installed") {
    val build = (s: SparkSession) => Relational.defs("j1_join_2way")(s, sf)
    val cands = Candidates.enumerate(spark, build)
    val gen = PlanFeatures.FeatureGenerator.fit(cands.map(_.plan))
    PlanChoice.install(new LeroModelPairWise(gen.featureDim, seed = 3), gen)
    try withExtensionSession { s2 =>
      graft.engine.Tables.registerAll(s2, sf)
      s2.conf.set(PlanChoice.EnabledKey, "false")
      PlanChoice.lastChoice.set(None)
      val n = Relational.defs("j1_join_2way")(s2, sf).collect()(0).getLong(0)
      assert(n > 0)
      assert(PlanChoice.lastChoice.get().isEmpty, "kill-switch ignored")
    } finally PlanChoice.uninstall()
  }

  test("AQE cost evaluator: heuristic without model, learned with") {
    import org.apache.spark.sql.execution.adaptive.SimpleCost
    PlanChoice.uninstall()
    val ev = new graft.plans.GraftCostEvaluator
    // force a shuffling plan (SMJ) so the heuristic cost is nonzero
    val plan = Candidates.withConfs(spark, Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")) {
      Relational.defs("j1_join_2way")(spark, sf).queryExecution.executedPlan
    }
    val heuristic = ev.evaluateCost(plan)
    assert(heuristic.isInstanceOf[SimpleCost])
    assert(heuristic.asInstanceOf[SimpleCost].value > 0, "SMJ plan must count shuffles")
    // install a model: cost becomes the (deterministic) model score
    val cands = Candidates.enumerate(spark,
      s => Relational.defs("j1_join_2way")(s, sf))
    val gen = PlanFeatures.FeatureGenerator.fit(cands.map(_.plan))
    val model = new LeroModelPairWise(gen.featureDim, seed = 11)
    PlanChoice.install(model, gen)
    try {
      val learned = ev.evaluateCost(plan).asInstanceOf[SimpleCost].value
      // model costs are shifted +1e12 (and clamped >= 0) so they stay
      // strictly below the unfeaturizable fallback's 1e13 offset —
      // the two cost domains must order sensibly when AQE compares a
      // featurizable plan against one whose featurization threw
      val expected = graft.plans.GraftCostEvaluator.modelCost(
        model.predict(Seq(gen.transform(
          PlanFeatures.fromSparkPlan(plan)))).head)
      assert(learned == expected)
      assert(learned < 10_000_000_000_000L,
        "model cost must stay below the unfeaturizable fallback band")
      assert(ev.evaluateCost(plan).asInstanceOf[SimpleCost].value == learned,
        "deterministic")
    } finally PlanChoice.uninstall()
  }

  test("cost clamp: a diverged score saturates worst-in-band, never wraps to best") {
    import graft.plans.GraftCostEvaluator.modelCost
    val top = 9_999_999_999_999L // band ceiling, below the 1e13 fallback
    // overflow regression: (score*1e6).toLong saturates at
    // Long.MaxValue; adding the offset to THAT wrapped negative and
    // the old post-offset max() mapped the worst plan to cost 0
    Seq(Double.PositiveInfinity, Double.MaxValue, 9.3e12, 1e18).foreach { s =>
      assert(modelCost(s) == top, s"score $s must saturate at the band top")
    }
    Seq(Double.NegativeInfinity, -Double.MaxValue, -9.3e12).foreach { s =>
      assert(modelCost(s) == 0L, s"score $s must saturate at the band floor")
    }
    // monotone in the normal range, inside [0, 1e13)
    val xs = Seq(-1e6, -1.0, 0.0, 1.0, 1e6).map(modelCost)
    assert(xs == xs.sorted && xs.distinct == xs, "monotone over normal scores")
    assert(xs.forall(c => c >= 0L && c < 10_000_000_000_000L))
    // NaN: indifferent midpoint, not an extreme
    assert(modelCost(Double.NaN) == 1_000_000_000_000L)
  }

  test("AQE session with the custom cost evaluator returns correct results") {
    PlanChoice.uninstall()
    val base = Relational.defs("j1_join_2way")(spark, sf).collect()(0).getLong(0)
    val got = Candidates.withConfs(spark, Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceApply" -> "true",
      "spark.sql.adaptive.customCostEvaluatorClass" ->
        "graft.plans.GraftCostEvaluator")) {
      Relational.defs("j1_join_2way")(spark, sf).collect()(0).getLong(0)
    }
    assert(got == base)
  }

  test("join-order variants give the comparator a real order choice on the 7-way family") {
    // unit level: the variant generator finds >=2 connected orders of
    // the optimized plan's join region (r4 verdict item 8)
    val optimized = Relational.defs("j1_join_7way")(spark, sf)
      .queryExecution.optimizedPlan
    val vs = graft.planopt.JoinOrders.variants(optimized)
    assert(vs.size >= 2, "no alternative connected join order generated")

    // integration level: routing the 7-way query scores candidates
    // drawn from >=2 distinct join orders, and the rewritten orders
    // preserve semantics
    val build = (s: SparkSession) => Relational.defs("j1_join_7way")(s, sf)
    val cands = Candidates.enumerate(spark, build)
    val gen = PlanFeatures.FeatureGenerator.fit(cands.map(_.plan))
    PlanChoice.install(new LeroModelPairWise(gen.featureDim, seed = 13), gen)
    try withExtensionSession { s2 =>
      graft.engine.Tables.registerAll(s2, sf)
      val base = build(spark).collect()(0).getLong(0)
      PlanChoice.lastChoice.set(None)
      val got = build(s2).collect()(0).getLong(0)
      assert(got == base, "order-rewritten candidate changed the result")
      val choice = PlanChoice.lastChoice.get()
      assert(choice.isDefined, "strategy did not fire on the 7-way join")
      assert(choice.get.nOrders >= 2,
        s"only ${choice.get.nOrders} join order(s) among ${choice.get.nCandidates} candidates")
      // repeat hits the choice cache and still returns the same result
      PlanChoice.lastChoice.set(None)
      assert(build(s2).collect()(0).getLong(0) == base)
      assert(PlanChoice.lastChoice.get().exists(_.nCandidates == 1),
        "expected choice-cache hit on the repeated 7-way query")
    } finally PlanChoice.uninstall()
  }

  test("non-join queries bypass the strategy") {
    val build = (s: SparkSession) => Relational.defs("j1_join_2way")(s, sf)
    val cands = Candidates.enumerate(spark, build)
    val gen = PlanFeatures.FeatureGenerator.fit(cands.map(_.plan))
    PlanChoice.install(new LeroModelPairWise(gen.featureDim, seed = 5), gen)
    try withExtensionSession { s2 =>
      graft.engine.Tables.registerAll(s2, sf)
      PlanChoice.lastChoice.set(None)
      val n = Relational.defs("s1_full_scan_count")(s2, sf).collect()(0).getLong(0)
      assert(n > 0)
      assert(PlanChoice.lastChoice.get().isEmpty, "fired on a scan-only query")
    } finally PlanChoice.uninstall()
  }
}
