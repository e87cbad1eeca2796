package graft.planopt

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

import graft.planopt.PlanFeatures.FeatTree

/** Pins the structural-determinism contract ParGemm is built on: the
  * canonical product is the FIXED-height slicing (SliceRows rows per
  * slice, independent of thread count), each output element is
  * produced by exactly one slice gemm, and serial mode computes the
  * same slices sequentially that parallel mode computes concurrently
  * — so results are bit-identical at any thread count. (The naive
  * claim "a row-slice bit-equals the unsliced product" is FALSE for
  * the underlying BLAS — measured last-ulp divergence — which is why
  * the fixed slicing is the contract, not an optimization detail.)
  */
class ParGemmSpec extends AnyFunSuite {

  private def randMat(r: Int, c: Int, seed: Int): DenseMatrix[Double] = {
    val rng = new scala.util.Random(seed)
    DenseMatrix.fill(r, c)(rng.nextGaussian())
  }

  private def bitsEqual(a: DenseMatrix[Double], b: DenseMatrix[Double]): Boolean =
    a.rows == b.rows && a.cols == b.cols && {
      val ad = a.toDenseMatrix.data; val bd = b.toDenseMatrix.data
      ad.indices.forall(i =>
        java.lang.Double.doubleToRawLongBits(ad(i)) ==
          java.lang.Double.doubleToRawLongBits(bd(i)))
    }

  private def withThreads[A](t: Int)(body: => A): A = {
    val old = ParGemm.threads
    ParGemm.threads = t
    try body finally ParGemm.threads = old
  }

  test("mul and mulTA are bit-identical serial vs 2/4/8 threads on " +
    "the net's shapes, and element-correct vs the plain product") {
    // the three shapes the conv layers feed: (N x 3*inC) gathers
    // against (3*inC x outC) weights, N = stacked batch rows
    val shapes = Seq((509, 36, 256), (509, 768, 128), (509, 384, 64),
      (2000, 768, 128), (63, 96, 32), (7, 6, 5))
    for (((n, k, m), si) <- shapes.zipWithIndex) {
      val a = randMat(n, k, 100 + si)
      val b = randMat(k, m, 200 + si)
      val c = randMat(n, m, 300 + si) // shares a's ROWS: a.t * c
      val canonMul = withThreads(1)(ParGemm.mul(a, b))
      val canonTA = withThreads(1)(ParGemm.mulTA(a, c))
      // value-correct vs the plain products (ulp-level tolerance)
      assert(breeze.linalg.max(breeze.numerics.abs(canonMul - a * b)) < 1e-9)
      assert(breeze.linalg.max(breeze.numerics.abs(canonTA - a.t * c)) < 1e-9)
      for (t <- Seq(2, 4, 8)) withThreads(t) {
        assert(bitsEqual(ParGemm.mul(a, b), canonMul),
          s"mul diverged at shape ($n,$k,$m) threads=$t")
        assert(bitsEqual(ParGemm.mulTA(a, c), canonTA),
          s"mulTA diverged at shape ($n,$k,$m) threads=$t")
      }
    }
    // transpose-view B operand (the dConv * w.t backward site)
    val a = randMat(400, 128, 7)
    val w = randMat(768, 128, 8)
    val canon = withThreads(1)(ParGemm.mul(a, w.t))
    withThreads(8) { assert(bitsEqual(ParGemm.mul(a, w.t), canon)) }
  }

  test("a full pairwise fit is bit-identical serial vs parallel") {
    val rng = new scala.util.Random(31)
    val dim = 9
    def tree(depth: Int): FeatTree = {
      val f = Array.fill(dim)(rng.nextDouble())
      if (depth == 0 || rng.nextDouble() < 0.3) FeatTree(f, None, None)
      else FeatTree(f, Some(tree(depth - 1)), Some(tree(depth - 1)))
    }
    val n = 40
    val x1 = IndexedSeq.fill(n)(tree(3))
    val x2 = IndexedSeq.fill(n)(tree(3))
    val y1 = IndexedSeq.fill(n)(rng.nextDouble())
    val y2 = IndexedSeq.fill(n)(rng.nextDouble())
    def fitScores(t: Int): (Seq[Double], Array[Double]) = withThreads(t) {
      val m = new LeroModelPairWise(dim, seed = 17L)
      val losses = m.fit(x1, x2, y1, y2, epochs = 4, batchSize = 16)
      (losses, m.predict(x1))
    }
    val (l1, s1) = fitScores(1)
    val (l8, s8) = fitScores(8)
    assert(l1.zip(l8).forall { case (a, b) =>
      java.lang.Double.doubleToRawLongBits(a) ==
        java.lang.Double.doubleToRawLongBits(b) },
      s"per-epoch losses diverged: $l1 vs $l8")
    assert(s1.zip(s8).forall { case (a, b) =>
      java.lang.Double.doubleToRawLongBits(a) ==
        java.lang.Double.doubleToRawLongBits(b) },
      "post-fit scores diverged")
  }
}
