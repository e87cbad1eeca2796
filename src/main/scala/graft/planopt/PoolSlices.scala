package graft.planopt

/** Structurally disjoint pool sampling for the three pipeline mains.
  *
  * The stable / dynamic / active pipelines all draw their workloads
  * from the committed 20k distribution-gated pool
  * (`results/r14_pool/train_pool.txt`). They previously drew with
  * independent seeded shuffles (seeds 42/123/99) and DOCUMENTED the
  * draws as disjoint — but independent shuffles overlap in
  * expectation (≈ n·m/N queries: ~10 between stable's 1000 and
  * active's 210), so the claim was false and risked train/eval
  * contamination between the stable training corpus and the
  * dynamic/active pools (r16 advice #1).
  *
  * Disjointness is now structural: ONE canonical seeded shuffle of
  * the pool, partitioned by post-shuffle index residue mod [[Mod]]
  * into non-overlapping stripes — no two pipelines can see the same
  * pool line no matter how many queries each requests. Stripe sizing
  * follows demand: stable (the 1000-query golden) gets 12/16 of the
  * pool (~15k), dynamic and active 2/16 each (~2.5k).
  */
object PoolSlices {

  /** The single canonical shuffle seed — per-pipeline variation comes
    * from the stripe, never from a second shuffle. */
  val ShuffleSeed = 42L

  val Mod = 16

  /** Post-shuffle index residues per pipeline — pairwise disjoint and
    * jointly covering 0 until [[Mod]]. */
  val Stripes: Map[String, Set[Int]] = Map(
    "stable" -> (0 to 11).toSet,
    "dynamic" -> Set(12, 13),
    "active" -> Set(14, 15))

  /** Draw `n` queries for `pipeline` from its stripe of the pool. */
  def sample(poolFile: String, pipeline: String, n: Int,
             log: Pipelines.Logger): Seq[String] = {
    val stripe = Stripes.getOrElse(pipeline, throw new IllegalArgumentException(
      s"unknown pipeline '$pipeline' — expected one of ${Stripes.keys.mkString(", ")}"))
    val src = scala.io.Source.fromFile(poolFile)
    val all =
      try src.getLines().map(_.trim).filter(_.nonEmpty).toVector
      finally src.close()
    val mine = new scala.util.Random(ShuffleSeed).shuffle(all)
      .zipWithIndex.collect { case (q, i) if stripe(i % Mod) => q }
    require(n <= mine.size, s"pipeline '$pipeline' stripe holds only " +
      s"${mine.size} of the ${all.size} pool queries; requested $n")
    val sample = mine.take(n)
    log.info(s"sampled ${sample.size} of ${all.size} pool queries from " +
      s"$poolFile (pipeline '$pipeline' stripe: one canonical shuffle " +
      s"seed=$ShuffleSeed, index residues ${stripe.toSeq.sorted.mkString("{", ",", "}")} " +
      s"mod $Mod — structurally disjoint from the other pipelines)")
    sample
  }
}
