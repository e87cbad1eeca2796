package graft.planopt

import org.apache.spark.sql.execution.{FileSourceScanExec, InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Plan featurization (SURVEY.md §2.2 M1–M5): physical plan tree →
  * binarized per-node feature vectors for the tree-convolution
  * comparator.
  *
  * Semantics mirror the reference featurizer
  * (`/root/reference/Lero/feature.py`):
  *  - node feature = op one-hot ⊕ input-table multiset (+1 unknown
  *    slot) ⊕ [width, normalized rows] (`feature.py:141-143`; costs
  *    are deliberately dropped, `feature.py:215-218`);
  *  - rows are log-min-max normalized over the fitted corpus
  *    (`Normalizer`, `feature.py:161-179`), width stays raw;
  *  - unary nodes are binarized with an all-zero "Unknown" right
  *    child (`feature.py:211-212`);
  *  - input tables accumulate bottom-up from scan leaves
  *    (`feature.py:196-234`).
  *
  * The op vocabulary is the SPARK physical op set (this is a Spark
  * plan ranker, not a PG one); scans surface as `FileScan`, the three
  * PG join variants as Broadcast/SortMerge/ShuffledHash/NestedLoop
  * joins, and exchanges — Spark's explicit shuffle ops, which PG
  * doesn't have — are first-class features, since shuffle placement
  * is exactly what differs between candidate Spark plans.
  */
object PlanFeatures {

  val UnknownOp = "Unknown"

  /** Spark physical op vocabulary (analog of `feature.py:11-15`
    * OP_TYPES). Anything unlisted one-hots to Unknown. */
  val OpTypes: Vector[String] = Vector(
    UnknownOp,
    "FileScan", "Filter", "Project",
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "Sort", "TakeOrderedAndProject", "GlobalLimit", "LocalLimit",
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "ShuffleExchange", "BroadcastExchange", "AQEShuffleRead",
    "Window", "Expand", "Generate", "Union", "Coalesce")

  /** The reference's PostgreSQL op vocabulary, verbatim
    * (`feature.py:11-15` OP_TYPES) — used when featurizing the
    * reference's committed EXPLAIN-JSON corpus so the comparator is
    * evaluated under the exact featurization the golden numbers used. */
  val PgOpTypes: Vector[String] = Vector(
    UnknownOp,
    "Hash", "Materialize", "Sort", "Aggregate", "Incremental Sort", "Limit",
    "Seq Scan", "Index Scan", "Index Only Scan", "Bitmap Heap Scan",
    "Nested Loop", "Hash Join", "Merge Join",
    "Bitmap Index Scan")

  /** Engine-agnostic plan-tree IR (what `fit`/`transform` consume —
    * built from a live SparkPlan by [[fromSparkPlan]] or synthesized
    * in tests). `rowsEst` is the optimizer's row estimate (PG "Plan
    * Rows" analog), `width` the estimated row width in bytes.
    */
  final case class PlanNode(opType: String, rowsEst: Double, width: Int,
                            relation: Option[String],
                            children: Seq[PlanNode]) {
    def allNodes: Seq[PlanNode] = this +: children.flatMap(_.allNodes)
  }

  /** Binarized feature tree (SampleEntity analog, `feature.py:116`).
    * Leaves have no children; every internal node has exactly two. */
  final case class FeatTree(feature: Array[Double],
                            left: Option[FeatTree], right: Option[FeatTree]) {
    require(left.isDefined == right.isDefined,
      "binarized tree: both children or none")
    def size: Int = 1 + left.map(_.size).getOrElse(0) + right.map(_.size).getOrElse(0)
  }

  /** Log-min-max normalizer (`feature.py:161-179`):
    * norm(x) = (log(x+1) − min) / (max − min). */
  final case class Normalizer(mins: Map[String, Double], maxs: Map[String, Double]) {
    def contains(name: String): Boolean = mins.contains(name) && maxs.contains(name)
    def norm(x: Double, name: String): Double = {
      require(contains(name), s"fail to normalize $name")
      (math.log(x + 1) - mins(name)) / (maxs(name) - mins(name))
    }
    def inverseNorm(x: Double, name: String): Double = {
      require(contains(name), s"fail to inversely normalize $name")
      math.exp(x * (maxs(name) - mins(name)) + mins(name)) - 1
    }
  }

  /** Fitted featurizer: normalizer + table vocabulary (M1/M2).
    * Feature dim = |opTypes| + (|tables|+1) + 2. The op vocabulary is
    * Spark's by default; the PG-corpus importer fits with
    * [[PgOpTypes]] instead. */
  final class FeatureGenerator private[PlanFeatures] (
      val normalizer: Normalizer,
      val inputRelations: Vector[String],
      val opTypes: Vector[String]) {

    val featureDim: Int = opTypes.length + inputRelations.length + 1 + 2

    private def opOneHot(op: String): Array[Double] = {
      val arr = new Array[Double](opTypes.length)
      val i = opTypes.indexOf(op)
      arr(if (i >= 0) i else opTypes.indexOf(UnknownOp)) = 1.0
      arr
    }

    private def encodeRelations(rels: Seq[String]): Array[Double] = {
      // multiset count vector + trailing unknown slot (feature.py:237-246)
      val arr = new Array[Double](inputRelations.length + 1)
      rels.foreach { r =>
        val i = inputRelations.indexOf(r)
        arr(if (i >= 0) i else inputRelations.length) += 1.0
      }
      arr
    }

    private def mkFeature(op: String, rels: Seq[String],
                          width: Double, rowsNorm: Double): Array[Double] =
      opOneHot(op) ++ encodeRelations(rels) ++ Array(width, rowsNorm)

    /** Zero "Unknown" leaf used to binarize unary nodes
      * (`feature.py:211-212`: rows/width raw zeros, no tables). */
    private def unknownLeaf: FeatTree =
      FeatTree(mkFeature(UnknownOp, Nil, 0.0, 0.0), None, None)

    /** M2/M3: plan tree → (binarized feature tree, accumulated input
      * tables). */
    def transform(node: PlanNode): FeatTree = transformRec(node)._1

    private def transformRec(node: PlanNode): (FeatTree, List[String]) = {
      require(node.children.size <= 2,
        s"plan node ${node.opType} has ${node.children.size} children; " +
          "binarize multi-way ops upstream (reference asserts <=2, feature.py:203)")
      val (left, right, childRels) = node.children match {
        case Seq() => (None, None, Nil)
        case Seq(only) =>
          val (l, rels) = transformRec(only)
          (Some(l), Some(unknownLeaf), rels)
        case Seq(c1, c2) =>
          val (l, rl) = transformRec(c1)
          val (r, rr) = transformRec(c2)
          (Some(l), Some(r), rl ++ rr)
      }
      val rels = childRels ++ node.relation.toList
      val rowsNorm = normalizer.norm(node.rowsEst, "Plan Rows")
      (FeatTree(mkFeature(node.opType, rels, node.width.toDouble, rowsNorm),
        left, right), rels)
    }

    /** Normalized execution-time label (when the corpus was fitted
      * with labels). */
    def normLabel(execTimeMs: Double): Double =
      normalizer.norm(execTimeMs, "Execution Time")

    def inverseLabel(y: Double): Double =
      normalizer.inverseNorm(y, "Execution Time")
  }

  object FeatureGenerator {
    /** M1: fit over a plan corpus (+ optional per-tree execution
      * times in ms). Mirrors `feature.py:33-93`. */
    def fit(trees: Seq[PlanNode], execTimesMs: Seq[Double] = Nil,
            opTypes: Vector[String] = OpTypes): FeatureGenerator = {
      val allNodes = trees.flatMap(_.allNodes)
      require(allNodes.nonEmpty, "cannot fit FeatureGenerator on empty corpus")
      val logRows = allNodes.map(n => math.log(n.rowsEst + 1))
      val rels = allNodes.flatMap(_.relation).distinct.toVector.sorted
      var mins = Map("Plan Rows" -> logRows.min)
      var maxs = Map("Plan Rows" -> logRows.max)
      if (execTimesMs.nonEmpty) {
        val logT = execTimesMs.map(t => math.log(t + 1))
        mins += ("Execution Time" -> logT.min)
        maxs += ("Execution Time" -> logT.max)
      }
      // guard degenerate min==max (single-plan corpora in tests)
      maxs = maxs.map { case (k, v) => k -> (if (v == mins(k)) v + 1.0 else v) }
      new FeatureGenerator(Normalizer(mins, maxs), rels, opTypes)
    }

    /** Reconstruct a fitted featurizer from persisted state
      * ([[graft.planopt.ModelIO]] load path — the deserialization
      * counterpart of the reference's pickled feature_generator,
      * `model.py:113-120`). */
    def restore(normalizer: Normalizer, inputRelations: Vector[String],
                opTypes: Vector[String]): FeatureGenerator =
      new FeatureGenerator(normalizer, inputRelations, opTypes)
  }

  // --- SparkPlan → PlanNode walker -----------------------------------

  /** Strips execution wrappers (WholeStageCodegen/InputAdapter/AQE
    * shells) that carry no planning semantics, then maps each physical
    * node to the IR. Multi-way nodes (Union etc.) are binarized into a
    * left-deep chain of synthetic nodes of the same op type.
    */
  def fromSparkPlan(plan: SparkPlan): PlanNode = {
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case w: WholeStageCodegenExec => unwrap(w.child)
      case i: InputAdapter => unwrap(i.child)
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case r: ReusedExchangeExec => unwrap(r.child)
      case other => other
    }
    val p = unwrap(plan)
    val op = {
      val n = p.getClass.getSimpleName.stripSuffix("Exec")
      // map ANY broadcast exchange first, then any other exchange
      // implementation (incl. third-party ShuffleExchangeLike nodes,
      // whose simple names still end in "Exchange" after the Exec
      // strip — the pre-fix "ExchangeExec" test could never match and
      // sent such nodes to the Unknown one-hot) onto ShuffleExchange
      if (n.startsWith("FileSourceScan")) "FileScan"
      else if (n.startsWith("BroadcastExchange")) "BroadcastExchange"
      else if (n.endsWith("Exchange")) "ShuffleExchange"
      else n
    }
    val relation = p match {
      case f: FileSourceScanExec => f.tableIdentifier.map(_.table)
      case _ => None
    }
    val rows: Double = p.logicalLink
      .flatMap(l => l.stats.rowCount.map(_.toDouble))
      .getOrElse {
        val width = math.max(1, p.schema.map(_.dataType.defaultSize).sum)
        p.logicalLink.map(_.stats.sizeInBytes.toDouble / width).getOrElse(1.0)
      }
    val width = p.schema.map(_.dataType.defaultSize).sum
    val children = p.children.map(fromSparkPlan)
    val node = PlanNode(op, rows, width, relation, children)
    if (children.size <= 2) node
    else // binarize multi-way (left-deep fold)
      children.reduceLeft { (a, b) =>
        PlanNode(op, rows, width, None, Seq(a, b))
      }
  }
}
