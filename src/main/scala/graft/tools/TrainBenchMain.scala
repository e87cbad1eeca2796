package graft.tools

import graft.planopt.{LeroModelPairWise, ParGemm}
import graft.planopt.PlanFeatures.FeatTree

/** Microbench for the pairwise trainer's throughput at a given
  * ParGemm thread count: synthesizes a workload-shaped pair set
  * (trees of the depth/fanout the candidate enumerator produces) and
  * times fit() epochs. Used to size the r16 stable-1000 run — NOT a
  * committed artifact; numbers vary with machine load.
  *
  * Usage: TrainBenchMain [nPairs] [epochs] [threads]
  */
object TrainBenchMain {
  def main(args: Array[String]): Unit = {
    val nPairs = args.lift(0).map(_.toInt).getOrElse(3000)
    val epochs = args.lift(1).map(_.toInt).getOrElse(3)
    val threads = args.lift(2).map(_.toInt).getOrElse(1)
    ParGemm.threads = threads
    val dim = 12
    val rng = new scala.util.Random(7)
    def tree(depth: Int): FeatTree = {
      val f = Array.fill(dim)(rng.nextDouble())
      if (depth == 0) FeatTree(f, None, None)
      else FeatTree(f, Some(tree(depth - 1)), Some(tree(depth - 1)))
    }
    // candidate plans are 4-16 node trees; depth 3 gives 15 nodes
    val x1 = IndexedSeq.fill(nPairs)(tree(3))
    val x2 = IndexedSeq.fill(nPairs)(tree(3))
    val y1 = IndexedSeq.fill(nPairs)(rng.nextDouble())
    val y2 = IndexedSeq.fill(nPairs)(rng.nextDouble())
    val m = new LeroModelPairWise(dim, seed = 17L)
    m.fit(x1.take(64), x2.take(64), y1.take(64), y2.take(64), epochs = 1) // JIT warmup
    val t0 = System.nanoTime()
    val losses = m.fit(x1, x2, y1, y2, epochs = epochs)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"threads=$threads pairs=$nPairs epochs=$epochs: " +
      f"$sec%.1fs total, ${sec / epochs}%.2fs/epoch, " +
      f"final loss ${losses.last}%.4f")
  }
}
