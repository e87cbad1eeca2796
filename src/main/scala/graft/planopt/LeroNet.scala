package graft.planopt

import breeze.linalg.{DenseMatrix, DenseVector}

import graft.planopt.PlanFeatures.FeatTree
import graft.planopt.TreeConv._

/** The plan-comparator network (SURVEY.md §2.2 M9–M12) and its
  * pairwise trainer (M11) — the model the reference repo exists to
  * train (`/root/reference/Lero/model.py:322-358` LeroNet,
  * `:220-305` LeroModelPairWise.fit).
  *
  * Architecture (`model.py:329-347`): TreeConv D→256→128→64 with
  * TreeLayerNorm + LeakyReLU between convs, LayerNorm + DynamicPooling
  * after the last, then FC 64→32→1 with LeakyReLU. `forward` returns
  * (score, 64-d pooled feature) — the intermediate feature feeds the
  * Bayesian head (M15).
  *
  * Training semantics preserved exactly (`model.py:244,262-305`;
  * SURVEY §2.2 note): pair label = 1.0 iff latency(x1) >= latency(x2);
  * loss = BCE(sigmoid(score1 − score2), label); so the net learns
  * P(plan1 slower) and LOWER score = faster plan → selection is
  * argmin of score (`lero_test.py:97`). Adam, batch 64, shuffled each
  * epoch (seeded here for reproducibility).
  */
final class LeroNet(val inputFeatureDim: Int, seed: Long = 17L) {
  private val rng = new scala.util.Random(seed)

  val conv1 = new ConvLayer(inputFeatureDim, 256, rng)
  val conv2 = new ConvLayer(256, 128, rng)
  val conv3 = new ConvLayer(128, 64, rng)
  val fc1 = new LinearLayer(64, 32, rng)
  val fc2 = new LinearLayer(32, 1, rng)

  /** Forward one prepared tree; returns (score, interFea64) and a
    * cache for backward. */
  def forward(nodes: DenseMatrix[Double], idx: Array[Int]): (Double, DenseVector[Double], LeroNet.Cache) = {
    val (c1, cc1) = conv1.forward(nodes, idx)
    val (n1, ln1) = LayerNorm.forward(c1)
    val a1 = LeakyReLU.forward(n1)
    val (c2, cc2) = conv2.forward(a1, idx)
    val (n2, ln2) = LayerNorm.forward(c2)
    val a2 = LeakyReLU.forward(n2)
    val (c3, cc3) = conv3.forward(a2, idx)
    val (n3, ln3) = LayerNorm.forward(c3)
    val (pooled, argmax) = DynamicPooling.forward(n3)
    val h1 = fc1.forward(pooled)
    val a3 = h1.map(v => if (v > 0) v else LeakyReLU.Slope * v)
    val out = fc2.forward(a3)
    (out(0), pooled,
      LeroNet.Cache(cc1, cc2, cc3, n1, ln1, n2, ln2, ln3, argmax, n3.rows, pooled, h1, a3))
  }

  /** Backward from dScore (+ optional gradient on the pooled feature,
    * for the Bayesian head); accumulates parameter grads. */
  def backward(dScore: Double, cache: LeroNet.Cache,
               dPooledExtra: Option[DenseVector[Double]] = None): Unit = {
    val dOut = DenseVector(dScore)
    val dA3 = fc2.backward(cache.a3, dOut)
    val dH1 = DenseVector.tabulate(dA3.length)(i =>
      if (cache.h1(i) > 0) dA3(i) else LeakyReLU.Slope * dA3(i))
    var dPooled = fc1.backward(cache.pooled, dH1)
    dPooledExtra.foreach(extra => dPooled = dPooled + extra)
    val dN3 = DynamicPooling.backward(dPooled, cache.argmax, cache.n3rows)
    val dC3 = LayerNorm.backward(dN3, cache.ln3)
    val dA2 = conv3.backward(dC3, cache.cc3)
    val dN2 = LeakyReLU.backward(dA2, cache.n2)
    val dC2 = LayerNorm.backward(dN2, cache.ln2)
    val dA1 = conv2.backward(dC2, cache.cc2)
    val dN1 = LeakyReLU.backward(dA1, cache.n1)
    val dC1 = LayerNorm.backward(dN1, cache.ln1)
    conv1.backward(dC1, cache.cc1) // dNodes discarded (inputs are constants)
  }

  /** Batched forward (training hot path): the three conv layers run
    * as ONE gemm per layer over the whole batch's stacked gather rows
    * (`ConvLayer.forwardBatch`); the per-tree pieces (layer norm,
    * pooling, FCs — all O(K·C) with no matmul) stay per-tree, so
    * results equal the per-tree `forward` to BLAS rounding. */
  def forwardBatch(nodesArr: Array[DenseMatrix[Double]], idxesArr: Array[Array[Int]])
  : (Array[Double], Array[DenseVector[Double]], LeroNet.BatchCache) = {
    val nT = nodesArr.length
    // per-tree loops write disjoint slot i and read only shared
    // immutable state (fc weights), so they run via parTrees —
    // identical results at any thread count
    val (c1s, bc1) = conv1.forwardBatch(nodesArr, idxesArr)
    val n1s = new Array[DenseMatrix[Double]](nT)
    val ln1s = new Array[LNCache](nT)
    val a1s = new Array[DenseMatrix[Double]](nT)
    ParGemm.parTrees(nT) { i =>
      val (n1, ln1) = LayerNorm.forward(c1s(i))
      n1s(i) = n1; ln1s(i) = ln1; a1s(i) = LeakyReLU.forward(n1)
    }
    val (c2s, bc2) = conv2.forwardBatch(a1s, idxesArr)
    val n2s = new Array[DenseMatrix[Double]](nT)
    val ln2s = new Array[LNCache](nT)
    val a2s = new Array[DenseMatrix[Double]](nT)
    ParGemm.parTrees(nT) { i =>
      val (n2, ln2) = LayerNorm.forward(c2s(i))
      n2s(i) = n2; ln2s(i) = ln2; a2s(i) = LeakyReLU.forward(n2)
    }
    val (c3s, bc3) = conv3.forwardBatch(a2s, idxesArr)
    val ln3s = new Array[LNCache](nT)
    val argmaxs = new Array[Array[Int]](nT)
    val n3rows = new Array[Int](nT)
    val pooleds = new Array[DenseVector[Double]](nT)
    val h1s = new Array[DenseVector[Double]](nT)
    val a3s = new Array[DenseVector[Double]](nT)
    val scores = new Array[Double](nT)
    ParGemm.parTrees(nT) { i =>
      val (n3, ln3) = LayerNorm.forward(c3s(i))
      val (pooled, argmax) = DynamicPooling.forward(n3)
      val h1 = fc1.forward(pooled)
      val a3 = h1.map(v => if (v > 0) v else LeakyReLU.Slope * v)
      scores(i) = fc2.forward(a3)(0)
      ln3s(i) = ln3; argmaxs(i) = argmax; n3rows(i) = n3.rows
      pooleds(i) = pooled; h1s(i) = h1; a3s(i) = a3
    }
    (scores, pooleds,
      LeroNet.BatchCache(bc1, bc2, bc3, n1s, ln1s, n2s, ln2s, ln3s,
        argmaxs, n3rows, pooleds, h1s, a3s))
  }

  /** Batched backward from per-tree dScores (+ optional per-tree
    * gradients on the pooled features, for the Bayesian head);
    * accumulates grads. */
  def backwardBatch(dScores: Array[Double], cache: LeroNet.BatchCache,
                    dPooledExtra: Option[Array[DenseVector[Double]]] = None): Unit = {
    val nT = dScores.length
    val dC3s = new Array[DenseMatrix[Double]](nT)
    // the fc head accumulates SHARED dW/dB per tree, so that part
    // stays a sequential loop (tree order — same accumulation bits as
    // ever); the per-tree pooling/LN backward below it is disjoint
    val dPooleds = new Array[DenseVector[Double]](nT)
    var i = 0
    while (i < nT) {
      val dA3 = fc2.backward(cache.a3s(i), DenseVector(dScores(i)))
      val dH1 = DenseVector.tabulate(dA3.length)(j =>
        if (cache.h1s(i)(j) > 0) dA3(j) else LeakyReLU.Slope * dA3(j))
      var dPooled = fc1.backward(cache.pooleds(i), dH1)
      dPooledExtra.foreach(extra => dPooled = dPooled + extra(i))
      dPooleds(i) = dPooled
      i += 1
    }
    ParGemm.parTrees(nT) { j =>
      val dN3 = DynamicPooling.backward(dPooleds(j), cache.argmaxs(j), cache.n3rows(j))
      dC3s(j) = LayerNorm.backward(dN3, cache.ln3s(j))
    }
    val dA2s = conv3.backwardBatch(dC3s, cache.bc3)
    val dC2s = new Array[DenseMatrix[Double]](nT)
    ParGemm.parTrees(nT) { j =>
      val dN2 = LeakyReLU.backward(dA2s(j), cache.n2s(j))
      dC2s(j) = LayerNorm.backward(dN2, cache.ln2s(j))
    }
    val dA1s = conv2.backwardBatch(dC2s, cache.bc2)
    val dC1s = new Array[DenseMatrix[Double]](nT)
    ParGemm.parTrees(nT) { j =>
      val dN1 = LeakyReLU.backward(dA1s(j), cache.n1s(j))
      dC1s(j) = LayerNorm.backward(dN1, cache.ln1s(j))
    }
    conv1.backwardBatch(dC1s, cache.bc1) // dNodes discarded
  }

  def zeroGrad(): Unit = {
    conv1.zeroGrad(); conv2.zeroGrad(); conv3.zeroGrad()
    fc1.zeroGrad(); fc2.zeroGrad()
  }

  /** (param, grad) pairs for the optimizer, vectors viewed as 1-col
    * matrices. */
  def paramGrads: Seq[(Array[Double], Array[Double])] = Seq(
    (conv1.w.data, conv1.dW.data), (conv1.b.data, conv1.dB.data),
    (conv2.w.data, conv2.dW.data), (conv2.b.data, conv2.dB.data),
    (conv3.w.data, conv3.dW.data), (conv3.b.data, conv3.dB.data),
    (fc1.w.data, fc1.dW.data), (fc1.b.data, fc1.dB.data),
    (fc2.w.data, fc2.dW.data), (fc2.b.data, fc2.dB.data))
}

object LeroNet {
  final case class Cache(cc1: ConvCache, cc2: ConvCache, cc3: ConvCache,
                         n1: DenseMatrix[Double], ln1: LNCache,
                         n2: DenseMatrix[Double], ln2: LNCache,
                         ln3: LNCache, argmax: Array[Int], n3rows: Int,
                         pooled: DenseVector[Double],
                         h1: DenseVector[Double], a3: DenseVector[Double])

  final case class BatchCache(bc1: BatchConvCache, bc2: BatchConvCache,
                              bc3: BatchConvCache,
                              n1s: Array[DenseMatrix[Double]], ln1s: Array[LNCache],
                              n2s: Array[DenseMatrix[Double]], ln2s: Array[LNCache],
                              ln3s: Array[LNCache], argmaxs: Array[Array[Int]],
                              n3rows: Array[Int],
                              pooleds: Array[DenseVector[Double]],
                              h1s: Array[DenseVector[Double]],
                              a3s: Array[DenseVector[Double]])
}

/** Adam (torch defaults: lr 1e-3, β 0.9/0.999, eps 1e-8) over flat
  * parameter arrays. */
final class Adam(paramGrads: Seq[(Array[Double], Array[Double])],
                 lr: Double = 1e-3) {
  private val m = paramGrads.map { case (p, _) => new Array[Double](p.length) }
  private val v = paramGrads.map { case (p, _) => new Array[Double](p.length) }
  private var t = 0

  def step(): Unit = {
    t += 1
    val b1 = 0.9; val b2 = 0.999; val eps = 1e-8
    val bc1 = 1 - math.pow(b1, t)
    val bc2 = 1 - math.pow(b2, t)
    paramGrads.zipWithIndex.foreach { case ((p, g), k) =>
      val mk = m(k); val vk = v(k)
      var i = 0
      while (i < p.length) {
        mk(i) = b1 * mk(i) + (1 - b1) * g(i)
        vk(i) = b2 * vk(i) + (1 - b2) * g(i) * g(i)
        p(i) -= lr * (mk(i) / bc1) / (math.sqrt(vk(i) / bc2) + eps)
        i += 1
      }
    }
  }
}

/** Pointwise regression model (M10, `model.py:128-197`): MSE on the
  * normalized latency (or a rank-score target, M13), Adam, batch 64.
  * The pairwise model below is the shipped mode; pointwise backs the
  * rank-score training variants (`lero_train.py:108-135`). */
final class LeroModelPointWise(val featureDim: Int, seed: Long = 17L) {
  val net = new LeroNet(featureDim, seed)
  private val shuffleRng = new scala.util.Random(seed ^ 0x9019)

  def fit(x: IndexedSeq[FeatTree], y: IndexedSeq[Double],
          epochs: Int = 100, batchSize: Int = 64): Seq[Double] = {
    require(x.length == y.length && x.nonEmpty)
    val prepared = x.map(t => TreeConv.prepareTrees(Seq(t)))
    val opt = new Adam(net.paramGrads)
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 0 until epochs) {
      val order = shuffleRng.shuffle(x.indices.toVector)
      var lossAccum = 0.0; var nBatches = 0
      order.grouped(batchSize).foreach { batch =>
        net.zeroGrad()
        var batchLoss = 0.0
        batch.foreach { i =>
          val (s, _, cache) = net.forward(prepared(i).nodes(0), prepared(i).idxes(0))
          val diff = s - y(i)
          batchLoss += diff * diff
          net.backward(2.0 * diff / batch.length, cache) // d MSE / d s
        }
        opt.step()
        lossAccum += batchLoss / batch.length
        nBatches += 1
      }
      losses += lossAccum / math.max(1, nBatches)
    }
    losses.toSeq
  }

  def predict(trees: Seq[FeatTree]): Array[Double] =
    trees.map { t =>
      val p = TreeConv.prepareTrees(Seq(t))
      net.forward(p.nodes(0), p.idxes(0))._1
    }.toArray
}

/** Pairwise comparator model (M11/M12): fit on (plan1, plan2, y1, y2)
  * tuples, predict scores, select argmin. */
final class LeroModelPairWise(val featureDim: Int, seed: Long = 17L) {
  val net = new LeroNet(featureDim, seed)
  private val shuffleRng = new scala.util.Random(seed ^ 0x5eed)

  /** BCE(sigmoid(s1-s2), label) pairwise fit (`model.py:220-305`).
    * Both sides of every pair in a batch go through ONE batched
    * forward/backward (one gemm per conv layer — the per-tree matmuls
    * were overhead-bound). Returns per-epoch mean losses. */
  def fit(x1: IndexedSeq[FeatTree], x2: IndexedSeq[FeatTree],
          y1: IndexedSeq[Double], y2: IndexedSeq[Double],
          epochs: Int = 100, batchSize: Int = 64): Seq[Double] = {
    require(x1.length == x2.length && y1.length == y2.length && x1.length == y1.length)
    val labels = y1.indices.map(i => if (y1(i) >= y2(i)) 1.0 else 0.0)
    // precompute layouts once (trees are immutable)
    val p1 = x1.map(t => TreeConv.prepareTrees(Seq(t)))
    val p2 = x2.map(t => TreeConv.prepareTrees(Seq(t)))
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    val opt = new Adam(net.paramGrads)
    for (_ <- 0 until epochs) {
      val order = shuffleRng.shuffle(x1.indices.toVector)
      var lossAccum = 0.0
      var nBatches = 0
      order.grouped(batchSize).foreach { batch =>
        net.zeroGrad()
        val bSize = batch.length
        // interleave (x1_i, x2_i) so one batched call covers both sides
        val nodesArr = new Array[breeze.linalg.DenseMatrix[Double]](2 * bSize)
        val idxesArr = new Array[Array[Int]](2 * bSize)
        batch.zipWithIndex.foreach { case (i, j) =>
          nodesArr(2 * j) = p1(i).nodes(0); idxesArr(2 * j) = p1(i).idxes(0)
          nodesArr(2 * j + 1) = p2(i).nodes(0); idxesArr(2 * j + 1) = p2(i).idxes(0)
        }
        val (scores, _, bcache) = net.forwardBatch(nodesArr, idxesArr)
        var batchLoss = 0.0
        val dScores = new Array[Double](2 * bSize)
        batch.zipWithIndex.foreach { case (i, j) =>
          val prob = 1.0 / (1.0 + math.exp(-(scores(2 * j) - scores(2 * j + 1))))
          val y = labels(i)
          val pc = math.min(1 - 1e-12, math.max(1e-12, prob))
          batchLoss += -(y * math.log(pc) + (1 - y) * math.log(1 - pc))
          val dS = (prob - y) / bSize // d BCE/d s1; d/d s2 = -dS
          dScores(2 * j) = dS; dScores(2 * j + 1) = -dS
        }
        net.backwardBatch(dScores, bcache)
        opt.step()
        lossAccum += batchLoss / bSize
        nBatches += 1
      }
      losses += lossAccum / math.max(1, nBatches)
    }
    losses.toSeq
  }

  /** Batch score (M12, `model.py:199-213`): lower = predicted faster. */
  def predict(trees: Seq[FeatTree]): Array[Double] = {
    if (trees.isEmpty) return Array.empty
    val ps = trees.map(t => TreeConv.prepareTrees(Seq(t)))
    net.forwardBatch(ps.map(_.nodes(0)).toArray, ps.map(_.idxes(0)).toArray)._1
  }

  /** Pooled 64-d intermediate features (for the Bayesian head). */
  def interFeatures(trees: Seq[FeatTree]): Array[DenseVector[Double]] = {
    if (trees.isEmpty) return Array.empty
    val ps = trees.map(t => TreeConv.prepareTrees(Seq(t)))
    net.forwardBatch(ps.map(_.nodes(0)).toArray, ps.map(_.idxes(0)).toArray)._2
  }

  /** Plan selection: argmin of predicted score (`lero_test.py:97`). */
  def selectBest(candidates: Seq[FeatTree]): Int = {
    val scores = predict(candidates)
    scores.indices.minBy(scores)
  }
}
