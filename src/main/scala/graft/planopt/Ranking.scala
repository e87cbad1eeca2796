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
