package graft.planopt

import breeze.linalg.DenseVector

import graft.planopt.PlanFeatures.FeatTree
import graft.planopt.TreeConv.LinearLayer

/** Uncertainty-aware pairwise comparator (SURVEY.md §2.2 M15) — the
  * Bayesian head of `/root/reference/Lero/model.py:361-520`,
  * reimplemented cleanly (the reference class hierarchy is dead code:
  * `BayesianNet.__init__` calls `super(LeroNet, ...)` and
  * `BayesianHead` extends a typo'd `nn.Modeule`, `model.py:363,400`
  * — SURVEY §2.2 says port the semantics, not the bugs).
  *
  * Head (`model.py:400-412`): Linear(128→32) → LeakyReLU →
  * Linear(32→2) → sigmoid on both outputs; input is the concatenated
  * 64-d pooled features of the two candidate plans; output[0] =
  * P(plan1 slower), output[1] = "log variance" (sigmoid-squashed, as
  * in the reference).
  *
  * Loss (`custom_nll_loss`, `model.py:392-398`): heteroscedastic
  * α·(½·logσ² + (y−p)²/2σ²) with σ² = exp(logvar); α down-weights
  * near-tie pairs: γ (default 0.2) when |Y1−Y2| < 0.1 else 1
  * (`model.py:415,449`).
  */
final class BayesianHead(seed: Long = 23L) {
  private val rng = new scala.util.Random(seed)
  val fc1 = new LinearLayer(128, 32, rng)
  val fc2 = new LinearLayer(32, 2, rng)

  final case class Cache(x: DenseVector[Double], h1: DenseVector[Double],
                         a1: DenseVector[Double], out: DenseVector[Double])

  /** (prob, logVar, cache) from concatenated pooled features. */
  def forward(fea1: DenseVector[Double], fea2: DenseVector[Double]): (Double, Double, Cache) = {
    val x = DenseVector.vertcat(fea1, fea2)
    val h1 = fc1.forward(x)
    val a1 = h1.map(v => if (v > 0) v else TreeConv.LeakyReLU.Slope * v)
    val z = fc2.forward(a1)
    val out = z.map(v => 1.0 / (1.0 + math.exp(-v)))
    (out(0), out(1), Cache(x, h1, a1, out))
  }

  /** Backward from (dProb, dLogVar); returns (dFea1, dFea2). */
  def backward(dProb: Double, dLogVar: Double, c: Cache): (DenseVector[Double], DenseVector[Double]) = {
    // sigmoid backward on both outputs
    val dZ = DenseVector(
      dProb * c.out(0) * (1 - c.out(0)),
      dLogVar * c.out(1) * (1 - c.out(1)))
    val dA1 = fc2.backward(c.a1, dZ)
    val dH1 = DenseVector.tabulate(dA1.length)(i =>
      if (c.h1(i) > 0) dA1(i) else TreeConv.LeakyReLU.Slope * dA1(i))
    val dX = fc1.backward(c.x, dH1)
    (dX(0 until 64), dX(64 until 128))
  }

  def zeroGrad(): Unit = { fc1.zeroGrad(); fc2.zeroGrad() }

  def paramGrads: Seq[(Array[Double], Array[Double])] = Seq(
    (fc1.w.data, fc1.dW.data), (fc1.b.data, fc1.dB.data),
    (fc2.w.data, fc2.dW.data), (fc2.b.data, fc2.dB.data))
}

object Bayesian {

  /** `custom_nll_loss` (`model.py:392-398`): α·(½·lv + (y−p)²/2e^lv).
    * Returns (loss, dLoss/dProb, dLoss/dLogVar). */
  def nllLoss(prob: Double, logVar: Double, target: Double, alpha: Double): (Double, Double, Double) = {
    val variance = math.exp(logVar)
    val loss = alpha * (0.5 * logVar + (target - prob) * (target - prob) / (2 * variance))
    val dProb = alpha * (prob - target) / variance
    val dLogVar = alpha * (0.5 - (target - prob) * (target - prob) / (2 * variance))
    (loss, dProb, dLogVar)
  }

  /** Pair weight α (`model.py:449`): γ for near-ties. */
  def pairAlpha(y1: Double, y2: Double, gamma: Double = 0.2,
                deltaThreshold: Double = 0.1): Double =
    if (math.abs(y1 - y2) < deltaThreshold) gamma else 1.0
}

/** Pairwise trainer with the Bayesian head on a shared LeroNet trunk
  * (`BayesianModelPairWise.fit`, `model.py:415-520`). */
final class BayesianModelPairWise(val featureDim: Int, seed: Long = 23L,
                                  gamma: Double = 0.2, deltaThreshold: Double = 0.1) {
  val net = new LeroNet(featureDim, seed)
  val head = new BayesianHead(seed)
  private val shuffleRng = new scala.util.Random(seed ^ 0xbee5)

  def fit(x1: IndexedSeq[FeatTree], x2: IndexedSeq[FeatTree],
          y1: IndexedSeq[Double], y2: IndexedSeq[Double],
          epochs: Int = 100, batchSize: Int = 64): Seq[Double] = {
    require(x1.length == x2.length && x1.length == y1.length && y1.length == y2.length)
    val labels = y1.indices.map(i => if (y1(i) >= y2(i)) 1.0 else 0.0)
    val alphas = y1.indices.map(i => Bayesian.pairAlpha(y1(i), y2(i), gamma, deltaThreshold))
    val p1 = x1.map(t => TreeConv.prepareTrees(Seq(t)))
    val p2 = x2.map(t => TreeConv.prepareTrees(Seq(t)))
    val opt = new Adam(net.paramGrads ++ head.paramGrads)
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 0 until epochs) {
      val order = shuffleRng.shuffle(x1.indices.toVector)
      var lossAccum = 0.0; var nBatches = 0
      order.grouped(batchSize).foreach { batch =>
        net.zeroGrad(); head.zeroGrad()
        val bSize = batch.length
        // both pair sides through ONE batched trunk pass (same scheme
        // as LeroModelPairWise.fit)
        val nodesArr = new Array[breeze.linalg.DenseMatrix[Double]](2 * bSize)
        val idxesArr = new Array[Array[Int]](2 * bSize)
        batch.zipWithIndex.foreach { case (i, j) =>
          nodesArr(2 * j) = p1(i).nodes(0); idxesArr(2 * j) = p1(i).idxes(0)
          nodesArr(2 * j + 1) = p2(i).nodes(0); idxesArr(2 * j + 1) = p2(i).idxes(0)
        }
        val (_, feats, bcache) = net.forwardBatch(nodesArr, idxesArr)
        var batchLoss = 0.0
        val dPooled = new Array[DenseVector[Double]](2 * bSize)
        batch.zipWithIndex.foreach { case (i, j) =>
          val (prob, logVar, hc) = head.forward(feats(2 * j), feats(2 * j + 1))
          val (loss, dProb, dLogVar) = Bayesian.nllLoss(prob, logVar, labels(i), alphas(i))
          batchLoss += loss
          val scale = 1.0 / bSize
          val (dFea1, dFea2) = head.backward(dProb * scale, dLogVar * scale, hc)
          dPooled(2 * j) = dFea1; dPooled(2 * j + 1) = dFea2
        }
        net.backwardBatch(new Array[Double](2 * bSize), bcache, Some(dPooled))
        opt.step()
        lossAccum += batchLoss / bSize
        nBatches += 1
      }
      losses += lossAccum / math.max(1, nBatches)
    }
    losses.toSeq
  }

  /** (P(plan1 slower), predictive variance) for a pair. */
  def predictPair(t1: FeatTree, t2: FeatTree): (Double, Double) = {
    val pp1 = TreeConv.prepareTrees(Seq(t1))
    val pp2 = TreeConv.prepareTrees(Seq(t2))
    val (_, fea1, _) = net.forward(pp1.nodes(0), pp1.idxes(0))
    val (_, fea2, _) = net.forward(pp2.nodes(0), pp2.idxes(0))
    val (prob, logVar, _) = head.forward(fea1, fea2)
    (prob, math.exp(logVar))
  }
}
