package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{CosineSimilarity, DotProduct, HyperplaneBands}

/** Property sweeps for the native expression kernels — interpreted
  * eval path over seeded random inputs (codegen parity is pinned
  * separately in PipelineSpec / PlanOptSpec). */
class FunctionsPropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(4242L)

  private def randVec(maxDim: Int = 64): Array[Double] = {
    val n = 1 + rng.nextInt(maxDim)
    Array.fill(n)(rng.nextDouble() * 20.0 - 10.0)
  }

  private def evalCosine(a: Array[Double], b: Array[Double]): Double = {
    val e = CosineSimilarity(
      BoundReference(0, ArrayType(DoubleType), nullable = false),
      BoundReference(1, ArrayType(DoubleType), nullable = false))
    e.eval(InternalRow(new GenericArrayData(a), new GenericArrayData(b)))
      .asInstanceOf[Double]
  }

  test("cosine: symmetric, bounded, self-similarity 1 (200 random vectors)") {
    (1 to 200).foreach { _ =>
      val a = randVec()
      val b = Array.fill(a.length)(rng.nextDouble() * 20.0 - 10.0)
      assert(math.abs(evalCosine(a, a) - 1.0) < 1e-9)
      val ab = evalCosine(a, b)
      assert(math.abs(ab - evalCosine(b, a)) < 1e-12, "symmetry")
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9, "Cauchy-Schwarz bound")
    }
  }

  private def evalDot(a: Array[Double], b: Array[Double]): Double = {
    val e = graft.functions.DotProduct(
      BoundReference(0, ArrayType(DoubleType), nullable = false),
      BoundReference(1, ArrayType(DoubleType), nullable = false))
    e.eval(InternalRow(new GenericArrayData(a), new GenericArrayData(b)))
      .asInstanceOf[Double]
  }

  test("dot: amortized-norm cosine is BIT-identical to the fused kernel") {
    // the kNN kernels compute dot/(na*nb) with per-row precomputed
    // norms; that decomposition must reproduce graft_cosine exactly
    // (same accumulation order, same final ops), not just approximately
    (1 to 200).foreach { _ =>
      val a = randVec()
      val b = Array.fill(a.length)(rng.nextDouble() * 20.0 - 10.0)
      val na = math.sqrt(evalDot(a, a))
      val nb = math.sqrt(evalDot(b, b))
      val decomposed = evalDot(a, b) / (na * nb)
      assert(decomposed == evalCosine(a, b), "bitwise parity")
    }
  }

  test("dot: EXACT for integer-valued doubles below 2^53 " +
    "(the clu1/sdd1 quantized-embedding contract, 500 random pairs)") {
    // Clustering scores quantized INTEGER vectors through graft_dot's
    // double path; the exactness argument (products ≤ ~10^13 and
    // 64-element running sums ≤ ~6.4·10^14 stay below 2^53, where
    // IEEE doubles represent and add integers exactly) is pinned here
    // against BigInt arithmetic at the full magnitude range the
    // quantizer can produce (|q_i| ≤ 3·10^6, dim 64).
    val e = DotProduct(
      BoundReference(0, ArrayType(DoubleType), nullable = false),
      BoundReference(1, ArrayType(DoubleType), nullable = false))
    (1 to 500).foreach { _ =>
      val n = 64
      val a = Array.fill(n)((rng.nextInt(6000001) - 3000000).toLong)
      val b = Array.fill(n)((rng.nextInt(6000001) - 3000000).toLong)
      val want = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val got = e.eval(InternalRow(
        new GenericArrayData(a.map(_.toDouble)),
        new GenericArrayData(b.map(_.toDouble)))).asInstanceOf[Double]
      assert(BigInt(got.toLong) == want && got == math.rint(got),
        s"double-path dot diverged: $got vs $want")
    }
  }

  test("dot: raises on length mismatch like the cosine kernel") {
    intercept[IllegalArgumentException] {
      evalDot(Array(1.0, 2.0), Array(1.0))
    }
  }

  test("cosine: invariant under positive scaling of either side") {
    (1 to 100).foreach { _ =>
      val a = randVec()
      val s = 0.1 + rng.nextDouble() * 99.9
      assert(math.abs(evalCosine(a, a.map(_ * s)) - 1.0) < 1e-9)
    }
  }

  private def bandsOf(v: Array[Double], bits: Int, n: Int, seed: Long): Seq[Long] = {
    val e = HyperplaneBands(
      BoundReference(0, ArrayType(DoubleType), nullable = false), bits, n, seed)
    e.eval(InternalRow(new GenericArrayData(v)))
      .asInstanceOf[ArrayData].toLongArray().toSeq
  }

  test("hyperplane bands: deterministic, ranged, scale-sign-invariant") {
    (1 to 100).foreach { _ =>
      val v = randVec()
      val seed = rng.nextLong()
      val s1 = bandsOf(v, 4, 8, seed)
      assert(s1 == bandsOf(v, 4, 8, seed), "deterministic")
      assert(s1.forall(x => x >= 0 && x < 16), "4-bit signatures")
      // positive scaling preserves every hyperplane sign => same sigs
      assert(s1 == bandsOf(v.map(_ * 3.7), 4, 8, seed))
    }
  }

  test("hyperplane bands: collision rate reflects cosine similarity") {
    // near-identical vectors collide in (almost) every band; random
    // pairs collide in far fewer — the LSH property the blocked
    // near-dup path is built on
    val dim = 64
    val base = Array.fill(dim)(rng.nextDouble() * 2 - 1)
    val near = base.zipWithIndex.map { case (x, i) =>
      if (i % 16 == 0) x + 0.01 else x } // tiny perturbation
    val bNear = bandsOf(base, 4, 32, 42L).zip(bandsOf(near, 4, 32, 42L))
      .count { case (x, y) => x == y }
    var randCollisions = 0
    (1 to 20).foreach { _ =>
      val r = Array.fill(dim)(rng.nextDouble() * 2 - 1)
      randCollisions += bandsOf(base, 4, 32, 42L).zip(bandsOf(r, 4, 32, 42L))
        .count { case (x, y) => x == y }
    }
    val randMean = randCollisions / 20.0
    assert(bNear >= 28, s"near-dup collided in only $bNear/32 bands")
    assert(randMean <= bNear / 2.0,
      s"random pairs collide too often: $randMean vs near $bNear")
  }

  test("band params honor the miss bound across thresholds") {
    for (tau <- Seq(0.1, 0.3, 0.4, 0.5, 0.7, 0.9, 0.95);
         miss <- Seq(1e-2, 1e-3, 1e-4)) {
      val (b, l) = HyperplaneBands.params(tau, miss)
      assert(b >= 1 && b <= 24 && l >= 1 && l <= 64, s"($b,$l) for tau=$tau")
      val p = 1.0 - math.acos(tau) / math.Pi
      assert(math.pow(1.0 - math.pow(p, b), l) <= miss + 1e-12,
        s"miss bound violated at tau=$tau miss=$miss -> ($b,$l)")
    }
  }

  test("scale-mode bandPlan is work-capped at any (tau, n) and keeps the miss bound") {
    // regression: the scale mode used to ignore maxBands entirely —
    // tau 0.4 on a 1e9-row corpus derived ~576k bands, a signature
    // frame that can never complete. The cap must hold everywhere,
    // and whenever bits could stay at the occupancy-derived value
    // (bands fit), the miss bound must hold exactly as before.
    for (tau <- Seq(0.1, 0.4, 0.7, 0.9, 0.99);
         n <- Seq(1000L, 100_000L, 10_000_000L, 1_000_000_000L)) {
      val (b, l) = HyperplaneBands.bandPlan(tau, 1e-4, n = Some(n))
      assert(b >= 1 && l <= 64, s"uncapped plan ($b,$l) at tau=$tau n=$n")
      // EVERY returned plan keeps the miss bound — a plan the cap
      // would force below the recall contract must throw instead
      // (tested below), never be returned clamped.
      val p = 1.0 - math.acos(tau) / math.Pi
      assert(math.pow(1.0 - math.pow(p, b), l) <= 1e-4 + 1e-12,
        s"miss bound violated at tau=$tau n=$n -> ($b,$l)")
    }
    // an unsatisfiable (tau, maxMiss, maxBands) combination fails
    // LOUDLY in both modes — maxMiss < 2^-maxBands cannot be met even
    // at bits=1 (per-band collision prob > 1/2 for tau > 0)
    intercept[IllegalArgumentException] {
      HyperplaneBands.bandPlan(0.5, 1e-4, n = Some(1000L), maxBands = 8)
    }
    intercept[IllegalArgumentException] {
      HyperplaneBands.bandPlan(0.5, 1e-4, n = None, maxBands = 8)
    }
    // selective-threshold sanity: the cap must NOT perturb the plans
    // the committed dd10 artifacts pin (occupancy-derived bits)
    assert(HyperplaneBands.bandPlan(0.9, 1e-3, n = Some(20001L)) == ((11, 35)))
  }

  private def evalIntersect(a: Array[Long], b: Array[Long]): Long = {
    val e = graft.functions.SortedIntersectCount(
      BoundReference(0, ArrayType(org.apache.spark.sql.types.LongType), nullable = false),
      BoundReference(1, ArrayType(org.apache.spark.sql.types.LongType), nullable = false))
    e.eval(InternalRow(new GenericArrayData(a), new GenericArrayData(b)))
      .asInstanceOf[Long]
  }

  test("bloom sketch: no false negatives, OR-merge ≡ combined build, " +
    "FPR near the analytic bound (seeded sweep)") {
    import graft.functions.BloomSketch
    (1 to 20).foreach { round =>
      val words = Seq(8, 32, 256)(rng.nextInt(3))
      val k = 1 + rng.nextInt(8)
      val n = 1 + rng.nextInt(200)
      val keys = Array.fill(n)(rng.nextLong())
      val (left, right) = keys.splitAt(rng.nextInt(n + 1))
      // split build + OR merge must equal the single-pass build —
      // the partial/final aggregation contract
      val one = new Array[Long](words)
      keys.foreach(BloomSketch.set(one, _, k))
      val a = new Array[Long](words); left.foreach(BloomSketch.set(a, _, k))
      val b = new Array[Long](words); right.foreach(BloomSketch.set(b, _, k))
      val merged = a.zip(b).map { case (x, y) => x | y }
      assert(java.util.Arrays.equals(one, merged),
        s"round $round: OR-merge diverged from combined build")
      // NO false negatives, ever
      keys.foreach { v =>
        assert(BloomSketch.mightContain(one, v, k),
          s"round $round: inserted key $v reported absent")
      }
      // false-positive rate stays within 3x the analytic
      // (1 - e^{-kn/m})^k bound (generous: small-m rounds are noisy)
      val m = words * 64.0
      val expFpr = math.pow(1.0 - math.exp(-k * n / m), k)
      val trials = 2000
      val keySet = keys.toSet
      val fp = (0 until trials).map(_ => rng.nextLong())
        .filterNot(keySet)
        .count(BloomSketch.mightContain(one, _, k))
      assert(fp <= math.max(8.0, 3.0 * expFpr * trials),
        s"round $round: $fp false positives in $trials " +
          f"(analytic ${expFpr * trials}%.1f, words=$words k=$k n=$n)")
    }
  }

  test("count-min sketch: never undercounts, sum-merge ≡ combined build, " +
    "estimate ≤ exact + 2N/width across seeded rounds") {
    import graft.functions.CmsSketch
    (1 to 20).foreach { round =>
      val width = Seq(64, 1024, 8192)(rng.nextInt(3))
      val depth = 1 + rng.nextInt(4)
      val n = 1 + rng.nextInt(5000)
      // zipf-ish key stream: heavy hitters + tail, the regime the
      // min-over-rows estimator exists for
      val keys = Array.fill(n)(
        if (rng.nextBoolean()) rng.nextLong(20) else rng.nextLong())
      val (left, right) = keys.splitAt(rng.nextInt(n + 1))
      val one = new Array[Long](depth * width)
      keys.foreach(CmsSketch.add(one, width, _, 1L))
      val a = new Array[Long](depth * width)
      left.foreach(CmsSketch.add(a, width, _, 1L))
      val b = new Array[Long](depth * width)
      right.foreach(CmsSketch.add(b, width, _, 1L))
      val merged = a.zip(b).map { case (x, y) => x + y }
      assert(java.util.Arrays.equals(one, merged),
        s"round $round: sum-merge diverged from combined build")
      // row mass conservation: every row holds exactly N counts
      (0 until depth).foreach { r =>
        assert(one.slice(r * width, (r + 1) * width).sum == n,
          s"round $round: row $r lost mass")
      }
      val exact = keys.groupBy(identity).map { case (k, o) => k -> o.length.toLong }
      // undercounting is impossible by construction — hard assert
      exact.foreach { case (k, c) =>
        val est = CmsSketch.estimate(one, width, k)
        assert(est >= c,
          s"round $round: undercount key=$k exact=$c est=$est")
      }
      // the 2N/width overcount margin is Markov-probabilistic:
      // P(one row over) ≤ 1/2, so P(min over depth rows over) ≤
      // (1/2)^depth per key. Assert at that level with the bloom
      // test's generous 3x + small-count floor (seeded, so
      // deterministic). The cms1 GATE pins the stronger
      // zero-violations outcome for its fixed depth-4 geometry and
      // corpus, measured at sf0.001→sf1.
      val margin = (2L * n + width - 1) / width
      val viol = exact.count { case (k, c) =>
        CmsSketch.estimate(one, width, k) > c + margin }
      val bound = math.max(4.0, 3.0 * math.pow(0.5, depth) * exact.size)
      assert(viol <= bound,
        s"round $round: $viol/${exact.size} keys past the 2N/width " +
          s"margin (markov bound ${bound.toInt}; width=$width " +
          s"depth=$depth n=$n)")
    }
  }

  test("sorted intersect count equals the reference set intersection (500 random set pairs)") {
    (1 to 500).foreach { _ =>
      val universe = 1 + rng.nextInt(200)
      val a = (0 until rng.nextInt(100)).map(_ => rng.nextInt(universe).toLong)
        .distinct.sorted.toArray
      val b = (0 until rng.nextInt(100)).map(_ => rng.nextInt(universe).toLong)
        .distinct.sorted.toArray
      val expected = a.toSet.intersect(b.toSet).size.toLong
      assert(evalIntersect(a, b) == expected)
      assert(evalIntersect(b, a) == expected, "symmetry")
      assert(evalIntersect(a, Array.empty[Long]) == 0L)
      assert(evalIntersect(a, a) == a.length.toLong, "self-intersection")
    }
  }

  test("topk-pairs buffer: equals a sort-based reference under ties, " +
      "duplicate ids, arbitrary split + merge (400 random streams)") {
    // The aggregate's contract is exactly what the window formulation
    // computed: top-k DISTINCT ids by (score DESC, id ASC), a repeated
    // id keeping its best entry. Scores are drawn from a tiny lattice
    // to force ties and ids from a small range to force duplicates;
    // each stream is split randomly across two buffers and merged,
    // mirroring partial/final aggregation.
    def ranksBefore(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    (1 to 400).foreach { _ =>
      val k = 1 + rng.nextInt(8)
      val n = rng.nextInt(80)
      val entries = Array.fill(n)(
        (rng.nextInt(5) * 0.25 - 0.5, (rng.nextInt(20) + 1).toLong))
      val ref = entries.groupBy(_._2).toSeq
        .map { case (id, es) => (es.map(_._1).max, id) } // best per id
        .sortWith(ranksBefore).take(k)
      val b1 = new graft.functions.TopKPairs.Buffer(k)
      val b2 = new graft.functions.TopKPairs.Buffer(k)
      entries.foreach { case (s, id) =>
        (if (rng.nextBoolean()) b1 else b2).insert(s, id) }
      var j = 0
      while (j < b2.size) { b1.insert(b2.scores(j), b2.ids(j)); j += 1 }
      val got = (0 until b1.size).map(i => (b1.scores(i), b1.ids(i))).toSeq
      assert(got == ref, s"k=$k entries=${entries.toSeq}")
    }
  }

  test("topk-pairs buffer: -0.0 folds to 0.0 so ties rank by id") {
    val b = new graft.functions.TopKPairs.Buffer(3)
    b.insert(-0.0, 7L)
    b.insert(0.0, 3L)
    b.insert(-1.0, 1L)
    val got = (0 until b.size).map(i => (b.scores(i), b.ids(i)))
    assert(got == Seq((0.0, 3L), (0.0, 7L), (-1.0, 1L)))
    // and the stored zero is POSITIVE zero in both entries
    assert((0 until 2).forall(i =>
      java.lang.Double.doubleToRawLongBits(b.scores(i)) == 0L))
  }
}
