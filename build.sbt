ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "active_query_optimizerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  // enables dev.ludovic.netlib VectorBLAS (SIMD) for Breeze/MLlib —
  // without it netlib falls back to scalar Java BLAS
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Throughput GC for a batch engine: measured on the full 90-query
  // bench at sf0.1/local[32], ParallelGC@12g beats G1@8g on both
  // passes (cold 101->98s, warm 80.5->72.5s) and zeroes the warm-pass
  // task GC on the dedup family (dd3 1.32->1.05s warm) — G1's pause
  // goals buy nothing here and its larger young gen at bigger heaps
  // regressed the cold pass (24g: 110.7s).
  "-XX:+UseParallelGC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // Deterministic GC geometry (r10 post-mortem): the driver-run cold
  // pass showed an 11.7s JVM-GC storm inside dd3's window that never
  // reproduces on an idle machine — classic ParallelGC adaptive-sizing
  // pathology: an allocation-heavy early query (dc1/dd10) shrinks
  // eden to meet ergonomic goals, the next signature-explode query
  // then promotion-storms through back-to-back full GCs while the
  // heap is still expanding from its small initial size. Pin the
  // heap at Xms=Xmx and fix a 4g young gen so collection geometry is
  // identical regardless of how loaded the host is.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:-UseAdaptiveSizePolicy",
  // Xms commits address space but NOT pages: the first query to CYCLE
  // eden pays page-fault + zero for every untouched survivor/old page
  // it copies into, booked as GC time inside that query's timed
  // window (measured: dd3 cold 4-6s with 40-156s summed task GC on an
  // IDLE host, warm clean — the residual storm the geometry pin alone
  // did not remove). Fault the whole heap at JVM start instead, where
  // it is nobody's timed window.
  "-XX:+AlwaysPreTouch",
) ++ {
  // fixed young gen only at the default heap — a caller overriding
  // SPARK_DRIVER_MEM below 8g must not get a 4g eden forced on them
  if (sys.env.get("SPARK_DRIVER_MEM").forall(_ == "12g")) Seq("-Xmn4g")
  else Seq.empty
}
