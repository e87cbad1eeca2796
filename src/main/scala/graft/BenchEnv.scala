package graft

/** Machine-readable contention attribution for bench artifacts
  * (r14 verdict #6): a hypervisor-contended run has a signature the
  * artifact itself can carry — WARM passes slower than cold by large
  * factors with ZERO GC and ZERO spill (nothing internal explains the
  * slowdown; the JVM was simply descheduled). The r14 driver run had
  * nine such queries (txt2 0.34→3.4 s, dd7 1.2→4.9 s, …) while the
  * builder's same-commit clean run had none — but the attribution
  * lived in a forensic comparison, not in `bench_out.json`. This
  * classifier stamps the verdict into the artifact so a polluted run
  * self-identifies.
  *
  * Rule: a query is an ANOMALY when warm ≥ [[WarmRegressionRatio]] ×
  * cold, cold ≥ [[MinColdSec]] (sub-quarter-second queries are timer
  * jitter), and the warm pass recorded ≤ [[MaxBenignGcFrac]] of its
  * wall in GC and zero spill (GC or spill would be an INTERNAL cause —
  * a real regression, not contention; those queries are deliberately
  * NOT counted here so a memory bug can't hide behind a "contended"
  * stamp). ≥ [[ContendedMinAnomalies]] anomalies ⇒ "contended".
  * Calibration: the two committed r14 runs (driver `bench_out.json`
  * at 0a3777a-successor vs builder 0c415f7) classify 9 vs 0.
  */
object BenchEnv {

  final case class Sample(coldSec: Double, warmSec: Double,
                          warmGcMs: Long, warmSpillBytes: Long)

  val WarmRegressionRatio = 1.5
  val MinColdSec = 0.25
  val MaxBenignGcFrac = 0.05
  val ContendedMinAnomalies = 3

  /** Queries whose warm-vs-cold regression has no internal cause. */
  def anomalies(samples: Map[String, Sample]): Seq[String] =
    samples.toSeq.sortBy(_._1).collect {
      case (q, s)
        if s.coldSec >= MinColdSec &&
          s.warmSec >= WarmRegressionRatio * s.coldSec &&
          s.warmGcMs <= (MaxBenignGcFrac * s.warmSec * 1000).toLong &&
          s.warmSpillBytes == 0L => q
    }

  /** ("contended" | "clean", anomalous query names). */
  def verdict(samples: Map[String, Sample]): (String, Seq[String]) = {
    val a = anomalies(samples)
    (if (a.size >= ContendedMinAnomalies) "contended" else "clean", a)
  }

  /** The `env` block for bench_out.json. */
  def envJson(samples: Map[String, Sample]): String = {
    val (v, a) = verdict(samples)
    s"""{"contention":"$v","warm_regressions":${a.size},""" +
      s""""anomalous":[${a.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""rule":"warm>=${WarmRegressionRatio}x cold, cold>=${MinColdSec}s, """ +
      s"""warm gc<=${(MaxBenignGcFrac * 100).toInt}% wall, zero spill; """ +
      s"""contended at >=$ContendedMinAnomalies"}"""
  }
}
