package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.planopt._
import graft.queries.{JoinVariants, Relational}

/** Candidate-plan generator + chooser tests (SURVEY §7.4 "done"
  * criteria): multiple distinct physical plans per join query, result
  * equality across variants, valid argmin selection. */
class CandidatesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def build(name: String)(s: org.apache.spark.sql.SparkSession) =
    Relational.defs(name)(s, sf)

  test("knob sweep yields >=2 distinct physical plans for joins") {
    for (q <- Seq("j1_join_2way", "j1_join_5way", "j1_join_7way")) {
      val cands = Candidates.enumerate(spark, build(q))
      assert(cands.size >= 2, s"$q produced ${cands.size} distinct plans")
      // canonical strings really differ
      assert(cands.map(_.canonical).distinct.size == cands.size)
    }
  }

  test("every candidate returns identical results") {
    val q = "j1_join_2way"
    val cands = Candidates.enumerate(spark, build(q))
    val counts = cands.map { c =>
      val (n, _) = Candidates.execute(spark, build(q), c.knobs)
      n
    }
    assert(counts.distinct.size == 1, s"variant results differ: $counts")
  }

  test("hint-steered J2 variants agree with the base join") {
    val base = Relational.defs("j1_join_2way")(spark, sf).collect()(0).getLong(0)
    JoinVariants.defs.foreach { case (name, fn) =>
      val got = fn(spark, sf).collect()(0).getLong(0)
      assert(got == base, s"$name: $got != $base")
    }
  }

  test("hints actually change the physical join operator") {
    def joinOps(name: String): Set[String] =
      PlanFeatures.fromSparkPlan(
        JoinVariants.defs(name)(spark, sf).queryExecution.executedPlan)
        .allNodes.map(_.opType)
        .filter(_.contains("Join")).toSet
    assert(joinOps("j2_variant_merge").contains("SortMergeJoin"))
    assert(joinOps("j2_variant_broadcast").contains("BroadcastHashJoin"))
    assert(joinOps("j2_variant_shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("chooser executes a valid candidate via argmin score") {
    val q = "j1_join_2way"
    val cands = Candidates.enumerate(spark, build(q))
    val gen = PlanFeatures.FeatureGenerator.fit(cands.map(_.plan))
    val model = new LeroModelPairWise(gen.featureDim, seed = 29)
    val (best, df) = Candidates.chooseAndExecute(spark, build(q), model, gen)
    assert(cands.map(_.canonical).contains(best.canonical))
    val expected = Relational.defs(q)(spark, sf).collect()(0).getLong(0)
    assert(df.collect()(0).getLong(0) == expected)
  }

  test("labeling produces positive wall-clock times") {
    val cands = Candidates.enumerate(spark, build("j1_join_2way")).take(2)
    val labeled = Candidates.labelCandidates(spark, build("j1_join_2way"), cands)
    assert(labeled.forall(_._2 > 0))
  }
}
