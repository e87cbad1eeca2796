package graft.planopt

/** Pair construction, rank-score targets, and the Spearman ranking
  * loss (SURVEY.md §2.2 M13/M14).
  */
object Ranking {

  /** `get_training_pair` (`/root/reference/Lero/lero_train.py:26-40`):
    * all n(n−1)/2 ordered pairs (i, j) with i < j over one query's
    * candidate list. */
  def trainingPairs[A](candidates: Seq[A]): Seq[(A, A)] = {
    require(candidates.length >= 2, "need >=2 candidates per query")
    for {
      i <- candidates.indices
      j <- (i + 1) until candidates.length
    } yield (candidates(i), candidates(j))
  }

  /** `compute_rank_score` targets (`lero_train.py:43-73`): rank
    * (1-based, by ascending latency) → x², x⁴, eˣ, or x. */
  def rankScore(rank1Based: Int, scoreType: Int): Double = scoreType match {
    case 0 => math.pow(rank1Based.toDouble, 2)
    case 1 => math.pow(rank1Based.toDouble, 4)
    case 2 => math.exp(rank1Based.toDouble)
    case 3 => rank1Based.toDouble
    case other => throw new IllegalArgumentException(s"rank score type $other")
  }

  /** Average ranks with ties (scipy `rankdata` 'average' — what
    * `spearmanr` uses). */
  private[planopt] def averageRanks(xs: Seq[Double]): Array[Double] = {
    val n = xs.length
    val order = xs.zipWithIndex.sortBy(_._1)
    val ranks = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && order(j + 1)._1 == order(i)._1) j += 1
      val avg = (i + j + 2) / 2.0 // mean of 1-based positions i+1..j+1
      (i to j).foreach(k => ranks(order(k)._2) = avg)
      i = j + 1
    }
    ranks
  }

  /** Spearman ρ = Pearson correlation of the rank vectors; NaN when
    * either input is constant. */
  def spearman(a: Seq[Double], b: Seq[Double]): Double = {
    require(a.length == b.length && a.length >= 2)
    val ra = averageRanks(a)
    val rb = averageRanks(b)
    val n = a.length
    val ma = ra.sum / n
    val mb = rb.sum / n
    var cov = 0.0; var va = 0.0; var vb = 0.0
    var i = 0
    while (i < n) {
      cov += (ra(i) - ma) * (rb(i) - mb)
      va += (ra(i) - ma) * (ra(i) - ma)
      vb += (rb(i) - mb) * (rb(i) - mb)
      i += 1
    }
    if (va == 0.0 || vb == 0.0) Double.NaN
    else cov / math.sqrt(va * vb)
  }

  /** Measurement resolution of the sf0.1 labeling protocol, as a
    * relative latency gap (r18). Measured basis: per-execution
    * wall-clock jitter on the 100–700 ms candidate plans is 2–5%
    * (r18 floorprobe flip histogram: the adaptive min-of-4 escalation
    * eliminated every flipped pair with gap > 20% and nearly all in
    * 10–20%, while flips under 4% were UNCHANGED — they are genuine
    * measured ties no sf0.1 sample count resolves). Pairs inside this
    * band are labeled EQUAL by [[snapResolutionTies]]; the reference
    * makes the same concession in training, down-weighting pairs with
    * |y1−y2| < 0.1 to α = 0.2 (`model.py:415,449`). */
  val TieSnapEps = 0.03

  /** Snap measured ties to equality across TWO label vectors of the
    * same candidate list (r18): tie groups are the transitive closure
    * of pairs whose best-estimate latencies (per-candidate min over
    * both vectors) differ by ≤ eps relative gap; each group's members
    * are set to the group mean WITHIN each vector. Ordering inside a
    * snapped group is below the protocol's measurement resolution —
    * after snapping, the tie-averaged Spearman treats either order
    * identically, so floors and losses measure only RESOLVABLE order.
    * Raw (unsnapped) numbers stay reported alongside; the snap is an
    * evaluation-resolution statement, never a training transform. */
  def snapResolutionTies(v1: Seq[Double], v2: Seq[Double],
                         eps: Double = TieSnapEps): (Seq[Double], Seq[Double]) = {
    require(v1.length == v2.length)
    val n = v1.length
    val best = v1.indices.map(i => math.min(v1(i), v2(i)))
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    for (i <- 0 until n; j <- (i + 1) until n) {
      val gap = math.abs(best(i) - best(j)) /
        math.max(math.max(best(i), best(j)), 1e-9)
      if (gap <= eps) parent(find(i)) = find(j)
    }
    val groups = (0 until n).groupBy(find)
    val o1 = v1.toArray
    val o2 = v2.toArray
    groups.values.foreach { g =>
      if (g.length > 1) {
        val a1 = g.map(v1).sum / g.length
        val a2 = g.map(v2).sum / g.length
        g.foreach { i => o1(i) = a1; o2(i) = a2 }
      }
    }
    (o1.toSeq, o2.toSeq)
  }

  /** `compute_ranking_loss` (`lero_test.py:115-155`): 1 − mean
    * Spearman ρ between predicted and true latency orders per query;
    * NaN queries (constant inputs) are skipped; None when nothing
    * survives. */
  def rankingLoss(predicted: Seq[Seq[Double]], trueLatencies: Seq[Seq[Double]]): Option[Double] = {
    require(predicted.length == trueLatencies.length)
    val corrs = predicted.zip(trueLatencies).flatMap { case (p, t) =>
      require(p.length == t.length, "prediction/latency length mismatch")
      if (p.length < 2) None
      else {
        val c = spearman(p, t)
        if (c.isNaN) None else Some(c)
      }
    }
    if (corrs.isEmpty) None else Some(1.0 - corrs.sum / corrs.length)
  }
}
