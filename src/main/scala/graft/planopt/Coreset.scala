package graft.planopt

import breeze.linalg.{DenseMatrix, DenseVector}

/** Active-learning coreset selection (SURVEY.md §2.2 M16–M18) — the
  * "active" in active_query_optimizer (`/root/reference/coreset.py`).
  * Selects which unlabeled queries to execute/label: MinHash-LSH
  * partitions the unlabeled feature matrix into similarity groups,
  * then a greedy k-center sweep per group picks the points least
  * covered by the labeled set.
  *
  * Ports preserved semantically:
  *  - `lsh_partition` (`coreset.py:5-46`): binarize each vector to
  *    its positive-coordinate index set, MinHash (128 perms), LSH at
  *    threshold 0.5 (32 bands × 4 rows — same banding the reference's
  *    datasketch config resolves to), group by the sorted candidate
  *    set each point retrieves, truncate to the largest `numGroups`
  *    groups / pad with empty;
  *  - `greedy_core_set_selection` (`coreset.py:48-89`): per group,
  *    repeatedly pick argmin over candidates of max cosine-sim to
  *    (labeled ∪ already-selected), maintaining the running max-sim
  *    via rank-1 updates;
  *  - `standardize_and_normalize` (`coreset.py:100-131`): z-score per
  *    feature over the CONCATENATED [U; L] (population std, zero-std
  *    → 1), then L2-normalize rows (zero-norm → 1). The reference's
  *    `torch.concatenate(U, L)` call is missing its list brackets and
  *    crashes — SURVEY §2.2 M18 says fix it, not copy it: vertical
  *    concatenation done properly here.
  *
  * Scale note: this is driver-side by design — it selects from
  * thousands of candidate QUERIES (feature rows), not data rows. The
  * distributed twin of the LSH partition (for corpus-scale inputs)
  * already exists in `graft.pipeline.Dedup.minhashSignatures`.
  */
object Coreset {

  private val NumPerm = 128
  private val Bands = 32 // × 4 rows = datasketch's (b,r) at threshold 0.5

  private def mix(d: Int, perm: Int): Long = {
    // splitmix64 over (d, perm) — a deterministic per-perm hash family
    var z = d.toLong * 0x9e3779b97f4a7c15L + perm.toLong * 0xbf58476d1ce4e5b9L + 0x94d049bb133111ebL
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature of a binarized vector (indices of positive
    * coordinates), as `coreset.py:12-17`. Empty sets get a sentinel
    * signature (never collides with real ones). */
  private def signature(posIdx: Array[Int]): Array[Long] =
    if (posIdx.isEmpty) Array.fill(NumPerm)(Long.MaxValue)
    else Array.tabulate(NumPerm)(p => posIdx.map(d => mix(d, p)).min)

  /** `lsh_partition` (`coreset.py:5-46`): returns `numGroups` lists of
    * row indices into U. */
  def lshPartition(u: DenseMatrix[Double], numGroups: Int): Seq[Seq[Int]] = {
    val n = u.rows
    val sigs = Array.tabulate(n) { i =>
      val pos = (0 until u.cols).filter(c => u(i, c) > 0).toArray
      signature(pos)
    }
    // band tables: band hash -> member indices
    val rows = NumPerm / Bands
    val tables = Array.fill(Bands)(
      scala.collection.mutable.Map[Seq[Long], scala.collection.mutable.ArrayBuffer[Int]]())
    for (i <- 0 until n; b <- 0 until Bands) {
      val key = sigs(i).slice(b * rows, (b + 1) * rows).toSeq
      tables(b).getOrElseUpdate(key, scala.collection.mutable.ArrayBuffer()) += i
    }
    // each point's query result = union of its band buckets; group by
    // the sorted result set (coreset.py:20-31)
    val buckets = scala.collection.mutable.LinkedHashMap[Seq[Int], scala.collection.mutable.ArrayBuffer[Int]]()
    for (i <- 0 until n) {
      val similar = scala.collection.mutable.SortedSet[Int]()
      for (b <- 0 until Bands) {
        val key = sigs(i).slice(b * rows, (b + 1) * rows).toSeq
        similar ++= tables(b)(key)
      }
      val id = similar.toSeq
      buckets.getOrElseUpdate(id, scala.collection.mutable.ArrayBuffer()) += i
    }
    var groups: Seq[Seq[Int]] = buckets.values.map(_.toSeq).toSeq
    if (groups.length > numGroups)
      groups = groups.sortBy(-_.length).take(numGroups)
    else if (groups.length < numGroups)
      groups = groups ++ Seq.fill(numGroups - groups.length)(Seq.empty[Int])
    groups
  }

  /** `greedy_core_set_selection` (`coreset.py:48-89`): per group,
    * greedy k-center against the labeled matrix L (rows assumed
    * normalized so inner product = cosine sim). Returns per-group
    * WITHIN-GROUP indices, like the reference. */
  def greedySelection(l: DenseMatrix[Double], uGroups: Seq[DenseMatrix[Double]],
                      perGroup: Int): Seq[Seq[Int]] =
    uGroups.map { ug =>
      if (ug.rows == 0) Seq.empty[Int]
      else {
        val simWithL = ug * l.t // (|U_g| × |L|)
        // cold start (no labeled rows yet): every point is maximally
        // far from L, so seed with -inf and the loop degenerates to
        // pure k-center over U — `.max` over an empty row range would
        // throw instead
        val maxSim = DenseVector.tabulate(ug.rows)(r =>
          if (l.rows == 0) Double.NegativeInfinity
          else (0 until l.rows).map(c => simWithL(r, c)).max)
        val candidates = scala.collection.mutable.ArrayBuffer.range(0, ug.rows)
        val selected = scala.collection.mutable.ArrayBuffer[Int]()
        while (selected.length < math.min(perGroup, ug.rows)) {
          val pick = candidates.minBy(maxSim(_))
          selected += pick
          candidates -= pick
          if (selected.length < perGroup && candidates.nonEmpty) {
            // rank-1 max-sim update vs the newly selected point
            val v = ug(pick, ::).t
            candidates.foreach { c =>
              val sim = ug(c, ::).t dot v
              if (sim > maxSim(c)) maxSim(c) = sim
            }
          }
        }
        selected.toSeq
      }
    }

  /** `coreset` (`coreset.py:91-98`): end-to-end — partition, select,
    * map back to global row indices into U. */
  def select(u: DenseMatrix[Double], l: DenseMatrix[Double],
             numGroups: Int, perGroup: Int): Seq[Int] = {
    val groupIdx = lshPartition(u, numGroups)
    val uGroups = groupIdx.map { idxs =>
      if (idxs.isEmpty) DenseMatrix.zeros[Double](0, u.cols)
      else {
        val m = DenseMatrix.zeros[Double](idxs.length, u.cols)
        idxs.zipWithIndex.foreach { case (gi, r) =>
          (0 until u.cols).foreach(c => m(r, c) = u(gi, c))
        }
        m
      }
    }
    val sel = greedySelection(l, uGroups, perGroup)
    groupIdx.zip(sel).flatMap { case (gIdx, s) => s.map(gIdx) }
  }

  /** `standardize_and_normalize` (`coreset.py:100-131`), concat bug
    * fixed: z-score per feature over [U; L] (population std), then
    * L2 row normalization. Returns (U', L'). */
  def standardizeAndNormalize(u: DenseMatrix[Double], l: DenseMatrix[Double]): (DenseMatrix[Double], DenseMatrix[Double]) = {
    require(u.cols == l.cols)
    val x = DenseMatrix.vertcat(u, l)
    val n = x.rows
    for (c <- 0 until x.cols) {
      var mean = 0.0
      (0 until n).foreach(r => mean += x(r, c))
      mean /= n
      var ss = 0.0
      (0 until n).foreach { r => val d = x(r, c) - mean; ss += d * d }
      val std = { val s = math.sqrt(ss / n); if (s == 0.0) 1.0 else s }
      (0 until n).foreach(r => x(r, c) = (x(r, c) - mean) / std)
    }
    for (r <- 0 until n) {
      var nrm = 0.0
      (0 until x.cols).foreach(c => nrm += x(r, c) * x(r, c))
      val d = { val s = math.sqrt(nrm); if (s == 0.0) 1.0 else s }
      (0 until x.cols).foreach(c => x(r, c) = x(r, c) / d)
    }
    (x(0 until u.rows, ::).copy, x(u.rows until n, ::).copy)
  }
}
