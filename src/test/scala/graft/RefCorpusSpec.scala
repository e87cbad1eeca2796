package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.planopt.{PgPlanImporter, Pipelines, PlanFeatures}

/** PG EXPLAIN-JSON corpus importer (the reference's committed
  * `stats_simplified/train_{0,1}` plan files): parse → PlanNode IR →
  * featurize with the reference's PG op vocabulary → trainable. */
class RefCorpusSpec extends AnyFunSuite {

  private val corpus = "/root/reference/Lero/dynamic_data/stats_simplified/train_1"

  test("parses every corpus line into labeled candidate plans") {
    val qs = PgPlanImporter.loadCorpus(corpus)
    assert(qs.size == 181)
    assert(qs.forall(_.plans.nonEmpty))
    assert(qs.forall(q => q.plans.size == q.latenciesMs.size))
    assert(qs.forall(_.latenciesMs.forall(_ > 0))) // Execution Time in ms
    // candidate multiplicity matches the committed corpus shape
    val counts = qs.map(_.plans.size).groupBy(identity).view.mapValues(_.size).toMap
    assert(counts(3) == 153 && counts(2) == 28)
  }

  test("imported trees carry PG semantics into the IR") {
    val qs = PgPlanImporter.loadCorpus(corpus)
    val nodes = qs.flatMap(_.plans).flatMap(_.allNodes)
    // every op observed is inside (or Unknown-mapped by) the PG vocabulary
    val unknownOps = nodes.map(_.opType).distinct
      .filterNot(PlanFeatures.PgOpTypes.contains)
    assert(unknownOps.isEmpty, s"ops outside feature.py vocabulary: $unknownOps")
    // scans carry relation names; the STATS schema has 8 tables
    val rels = nodes.flatMap(_.relation).distinct
    assert(rels.nonEmpty && rels.size <= 8, rels)
    assert(nodes.forall(_.children.size <= 2), "binarized")
    assert(nodes.forall(_.rowsEst >= 0))
  }

  test("featurizes and trains a comparator on the reference corpus") {
    val qs = PgPlanImporter.loadCorpus(corpus).take(12)
    val (fg, model) = Pipelines.train(qs, epochs = 3, seed = 17L,
      opTypes = PlanFeatures.PgOpTypes)
    assert(fg.opTypes == PlanFeatures.PgOpTypes)
    assert(fg.featureDim == PlanFeatures.PgOpTypes.size + fg.inputRelations.size + 1 + 2)
    val res = Pipelines.evaluate(fg, model, qs)
    assert(res.rankingLoss.isDefined)
    assert(res.leroDict.size == qs.count(_.plans.size >= 2))
  }
}
