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
}
