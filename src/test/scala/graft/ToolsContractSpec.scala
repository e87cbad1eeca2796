package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sf1-sweep tooling contracts that live outside the JVM
  * (r14 verdict #1): sim6's engaged-cap divergence is only recordable
  * as `pass` after `tools/knn_oracle_chunked.py` ASSERTS the demotion
  * contract, and the classifier itself must reject the synthetic
  * negative-gap result (a capped answer "beating" the exact oracle —
  * a real bug the pre-r15 tool would have waved through as exit 3).
  * The python selftest feeds exactly those cases; this spec makes it
  * part of `sbt test` so a classifier regression fails the build, not
  * just the next sf1 sweep.
  */
class ToolsContractSpec extends AnyFunSuite {

  private def run(args: String*): (Int, String) = {
    val pb = new ProcessBuilder(("python3" +: args).toArray: _*)
    pb.directory(new java.io.File(sys.props.getOrElse("user.dir", ".")))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    (p.waitFor(), out)
  }

  test("knn_oracle_chunked --selftest: the engaged-cap contract " +
    "classifier rejects negative gaps, over-ceiling gaps, score drift " +
    "and shape loss, and accepts legitimate demotions") {
    val (code, out) = run("tools/knn_oracle_chunked.py", "--selftest")
    assert(code == 0, s"selftest failed:\n$out")
    assert(out.contains("SELFTEST PASS"), out)
    // the case the r14 verdict called out by name must be present and
    // classified as a failure
    assert(out.contains("negative gap") && !out.contains("MISCLASSIFIED"),
      out)
  }

  test("sweep_contracts.json: the approximate-path bounds are " +
    "committed data with the declared values (r14 verdict #8 — a " +
    "sweep cannot silently loosen them; changing one is a visible " +
    "data+spec diff)") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/sweep_contracts.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    // the file is the single source both tools load at import time —
    // pin each bound's exact committed value with a tight regex over
    // the raw JSON (no JSON lib needed for five scalars)
    def bound(section: String, key: String): String = {
      val sec = txt.drop(txt.indexOf("\"" + section + "\""))
      val m = ("\"" + key + "\"\\s*:\\s*([-0-9.eE]+)").r
        .findFirstMatchIn(sec)
      assert(m.isDefined, s"$section.$key missing from sweep_contracts.json")
      m.get.group(1)
    }
    assert(bound("sim6_knn_capped", "gap_min").toDouble == -1e-9)
    assert(bound("sim6_knn_capped", "gap_max").toDouble == 0.01)
    assert(bound("dd5_blocked_neardup", "max_misses").toInt == 25)
    assert(bound("dd5_blocked_neardup", "miss_cos_ceil").toDouble == 0.45)
    assert(bound("sim3_ann_ivf", "min_recall").toDouble == 0.9)
    assert(bound("sim3_ann_ivf", "top_pool").toInt == 50)
    // er4's volume-floor contract (r16): measured sf1 values are
    // multiplicity 1.4754 and 4470 qualifying/dirty; the bounds leave
    // fresh-corpus headroom without admitting a scheme regression
    assert(bound("er4_er_short_mixed", "max_arm_multiplicity")
      .toDouble == 1.6)
    assert(bound("er4_er_short_mixed", "min_qualifying_per_dirty")
      .toDouble == 1000)
    // and the python side actually reads the file: the constants must
    // no longer be literal in either tool
    for (tool <- Seq("tools/sf1_sweep.py", "tools/knn_oracle_chunked.py")) {
      val src = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(tool)),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(src.contains("sweep_contracts.json"),
        s"$tool no longer loads the committed contract file")
    }
  }
}
