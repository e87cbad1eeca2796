package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{Cost, CostEvaluator, SimpleCost}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.planopt.PlanFeatures

/** AQE cost evaluator (SURVEY §4 "adaptive re-optimization" row):
  * enable with
  * `spark.sql.adaptive.customCostEvaluatorClass=graft.plans.GraftCostEvaluator`.
  *
  * AQE re-optimizes each query stage at runtime and keeps the new
  * plan only if its cost does not regress; this evaluator makes that
  * comparison learned: when a comparator is installed
  * ([[PlanChoice.install]]), the plan's cost is its model score
  * (lower = predicted faster, `Lero/lero_test.py:40` semantics)
  * mapped monotonically onto the long cost domain. With no model
  * installed it reproduces the built-in heuristic — shuffle count —
  * so the conf can ship enabled everywhere.
  *
  * This composes with [[LearnedPlanStrategy]]: the strategy picks the
  * static plan pre-execution; the evaluator then judges AQE's runtime
  * re-plans of its stages with the same model instead of a blind
  * shuffle count.
  */
class GraftCostEvaluator extends CostEvaluator {

  override def evaluateCost(plan: SparkPlan): Cost =
    PlanChoice.current match {
      case Some((model, gen)) =>
        try {
          val score = model.predict(
            Seq(gen.transform(PlanFeatures.fromSparkPlan(plan)))).head
          // monotone map to the SimpleCost long domain, SHIFTED
          // non-negative (SimpleCost longs compare unsigned-ish in
          // intent; a negative score must still order below a bigger
          // one): 1e6 preserves score differences well above the
          // comparator's noise floor, and the +1e12 offset keeps every
          // model cost strictly below the unfeaturizable fallback.
          SimpleCost(GraftCostEvaluator.modelCost(score))
        } catch { // unfeaturizable stage plan: see fallback doc below
          case _: Exception => unfeaturizableCost(plan)
        }
      case None => shuffleCount(plan, 0L)
    }

  /** Fallback when featurization throws for a stage plan: AQE compares
    * this cost against the PARTNER plan's cost, which may be a model
    * score — the two domains must still order sensibly. Model costs
    * live in [0, ~2e12]; the fallback starts at 1e13 + shuffle count,
    * so an unfeaturizable plan always loses to a featurizable one
    * (conservative: keep the plan the model can actually reason
    * about), and two unfeaturizable plans order by shuffle count
    * among themselves. Before this shift, one failed featurization
    * put a raw shuffle count (0–10) against a model cost in the
    * millions and the comparison was decided by WHICH plan failed,
    * not by predicted speed. */
  private def unfeaturizableCost(plan: SparkPlan): Cost =
    shuffleCount(plan, 10_000_000_000_000L)

  private def shuffleCount(plan: SparkPlan, offset: Long): Cost =
    SimpleCost(offset +
      plan.collect { case s: ShuffleExchangeLike => s }.size.toLong)
}

object GraftCostEvaluator {
  /** Monotone map from a model score to the long cost domain, SHIFTED
    * non-negative (a negative score must still order below a bigger
    * one): 1e6 preserves score differences well above the
    * comparator's noise floor, the +1e12 offset keeps every model
    * cost strictly below the unfeaturizable fallback band (1e13+).
    * Clamped to [0, 1e13) — and the clamp applies to the SCALED score
    * BEFORE the offset: `(score * 1e6).toLong` saturates at
    * Long.MaxValue for a diverged/infinite score, and adding the
    * offset to the saturated value would wrap NEGATIVE, mapping the
    * catastrophically WORST plan to cost 0 — the best possible
    * (regression-tested in PlannerInjectionSpec). NaN maps to the
    * band floor's midpoint (scaled 0 → 1e12) — indifferent, never
    * best-or-worst. */
  private[graft] def modelCost(score: Double): Long = {
    val scaled = math.min(8_999_999_999_999L,
      math.max(-1_000_000_000_000L, (score * 1e6).toLong))
    scaled + 1_000_000_000_000L
  }
}
