package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench contention classifier (r14 verdict #6) against the
  * two real r14 runs it was built to separate: the driver's
  * end-of-round run (committed `bench_out.json`, 9 queries warm ≥ 1.5×
  * cold at zero GC and zero spill — the hypervisor-contention
  * signature) and the builder's same-commit clean run
  * (`git show 0c415f7:bench_out.json`, warm ≤ cold per query). The
  * fixtures below are those artifacts' recorded values verbatim.
  */
class BenchEnvSpec extends AnyFunSuite {
  import BenchEnv._

  // warm-pass GC/spill were zero for every one of these queries in
  // both runs (bench_diag.json per_query rows)
  private def S(cold: Double, warm: Double,
                gcMs: Long = 0L, spill: Long = 0L) =
    Sample(cold, warm, gcMs, spill)

  private val contendedRun = Map( // r14 driver bench_out.json
    "txt2_lang_id" -> S(0.343, 3.408),
    "txt6_ngram_topk" -> S(0.495, 4.338),
    "txt1_token_stats" -> S(0.303, 2.321),
    "txt3_quality" -> S(0.345, 2.461),
    "txt4_fingerprint" -> S(0.262, 1.81),
    "txt7_redact" -> S(0.444, 3.03),
    "txt8_chunk_overlap" -> S(0.344, 1.724),
    "dd7_incremental_dedup" -> S(1.221, 4.904),
    "sim7_knn_engaged" -> S(1.01, 1.594),
    "q1_group_agg" -> S(0.526, 0.393),
    "io10_range_layout" -> S(10.189, 0.75),
    "g2_copurchase" -> S(5.751, 0.745))

  private val cleanRun = Map( // r14 builder run, 0c415f7
    "txt2_lang_id" -> S(0.472, 0.337),
    "txt6_ngram_topk" -> S(0.653, 0.433),
    "txt1_token_stats" -> S(0.386, 0.237),
    "txt3_quality" -> S(0.448, 0.31),
    "txt4_fingerprint" -> S(0.397, 0.215),
    "txt7_redact" -> S(0.725, 0.375),
    "txt8_chunk_overlap" -> S(0.485, 0.325),
    "dd7_incremental_dedup" -> S(1.373, 1.242),
    "sim7_knn_engaged" -> S(1.726, 1.546),
    "q1_group_agg" -> S(0.64, 0.566),
    "io10_range_layout" -> S(3.069, 0.851),
    "g2_copurchase" -> S(1.553, 0.719))

  test("the two r14 runs classify as contended / clean respectively") {
    val (vc, ac) = verdict(contendedRun)
    assert(vc == "contended")
    assert(ac.size == 9, s"anomalies: $ac")
    assert(ac.toSet == contendedRun.keySet -- Set(
      "q1_group_agg", "io10_range_layout", "g2_copurchase"))
    val (vl, al) = verdict(cleanRun)
    assert(vl == "clean" && al.isEmpty, s"clean run flagged: $al")
  }

  test("internal causes are excluded: GC-heavy or spilling warm " +
    "regressions do not count as contention") {
    val gcHeavy = Map(
      "a" -> S(1.0, 3.0, gcMs = 2000L), // 2s of GC in a 3s warm pass
      "b" -> S(1.0, 3.0, spill = 1L << 20),
      "c" -> S(1.0, 3.0), "d" -> S(1.0, 3.0), "e" -> S(1.0, 3.0))
    val (v, a) = verdict(gcHeavy)
    assert(a == Seq("c", "d", "e"), s"got $a")
    assert(v == "contended") // the three unexplained ones still trip it
    // sub-threshold: fewer than ContendedMinAnomalies stays clean
    assert(verdict(gcHeavy - "d" - "e")._1 == "clean")
    // timer jitter on sub-quarter-second queries never counts
    assert(verdict(Map("tiny1" -> S(0.05, 0.2), "tiny2" -> S(0.08, 0.31),
      "tiny3" -> S(0.11, 0.9)))._1 == "clean")
  }

  test("envJson carries the verdict, count, names and rule") {
    val j = BenchEnv.envJson(contendedRun)
    assert(j.contains("\"contention\":\"contended\""))
    assert(j.contains("\"warm_regressions\":9"))
    assert(j.contains("txt2_lang_id") && j.contains("dd7_incremental_dedup"))
    assert(j.contains("\"rule\":"))
  }
}
