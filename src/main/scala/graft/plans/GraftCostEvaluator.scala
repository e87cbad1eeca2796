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
        // monotone map to the SimpleCost long domain; 1e6 preserves
        // score differences well above the comparator's noise floor
          SimpleCost((score * 1e6).toLong)
        } catch { // unfeaturizable stage plan: fall back to heuristic
          case _: Exception => shuffleCount(plan)
        }
      case None => shuffleCount(plan)
    }

  private def shuffleCount(plan: SparkPlan): Cost =
    SimpleCost(plan.collect { case s: ShuffleExchangeLike => s }.size.toLong)
}
