package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.planopt.{Pipelines, PoolSlices}

/** Pins the structural-disjointness contract (r16 advice #1): the
  * three pipeline mains draw from non-overlapping stripes of ONE
  * canonical pool shuffle — the property the old per-main seeds
  * (42/123/99) claimed but did not have (independent shuffles overlap
  * in expectation).
  */
class PoolSlicesSpec extends AnyFunSuite {

  private def tmpPool(n: Int): String = {
    val f = java.io.File.createTempFile("pool", ".txt")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      (0 until n).map(i => s"SELECT $i").mkString("\n") + "\n")
    f.getAbsolutePath
  }

  test("stripes are pairwise disjoint and jointly cover every residue") {
    val all = PoolSlices.Stripes.values.toSeq
    for (a <- all.indices; b <- (a + 1) until all.size)
      assert((all(a) & all(b)).isEmpty, s"stripes $a and $b overlap")
    assert(all.reduce(_ ++ _) == (0 until PoolSlices.Mod).toSet)
  }

  test("samples from different pipelines never share a pool line, at " +
    "ANY requested sizes, and are deterministic") {
    val pool = tmpPool(1600)
    val log = new Pipelines.Logger(None)
    val stable = PoolSlices.sample(pool, "stable", 900, log)
    val dynamic = PoolSlices.sample(pool, "dynamic", 150, log)
    val active = PoolSlices.sample(pool, "active", 150, log)
    // all lines are genuine pool lines, no duplicates within a draw
    val sets = Seq(stable, dynamic, active).map(_.toSet)
    assert(sets.zip(Seq(stable, dynamic, active))
      .forall { case (s, l) => s.size == l.size })
    // pairwise disjoint — the contract the docs and run logs state
    assert((sets(0) & sets(1)).isEmpty)
    assert((sets(0) & sets(2)).isEmpty)
    assert((sets(1) & sets(2)).isEmpty)
    // deterministic: a second draw is identical (goldens depend on it)
    assert(PoolSlices.sample(pool, "stable", 900, log) == stable)
    // a smaller draw is a PREFIX of a bigger one (run-size changes
    // never reshuffle who saw what)
    assert(PoolSlices.sample(pool, "stable", 100, log) == stable.take(100))
  }

  test("over-asking a stripe fails loudly instead of spilling into " +
    "another pipeline's lines") {
    val pool = tmpPool(160)
    val log = new Pipelines.Logger(None)
    // dynamic's stripe holds 2/16 of 160 = 20 lines
    assert(PoolSlices.sample(pool, "dynamic", 20, log).size == 20)
    intercept[IllegalArgumentException] {
      PoolSlices.sample(pool, "dynamic", 21, log)
    }
    intercept[IllegalArgumentException] {
      PoolSlices.sample(pool, "nonexistent", 1, log)
    }
  }
}
