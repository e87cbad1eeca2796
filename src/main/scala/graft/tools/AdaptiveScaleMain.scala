package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.Similarity

/** Diagnostic: measures dd10's adaptive-banding claim at a given
  * scale — candidate-pair volume under the ADAPTIVE plan (bits from
  * the corpus count) vs under a FIXED plan pinned at a smaller
  * corpus's derivation — so SCALE.md's sub-quadratic numbers are
  * artifact-backed rather than analytic only.
  *
  * Usage: AdaptiveScaleMain <sfDir> [fixedBits fixedBands]
  * (default fixed plan: the sf0.1 derivation (7, 17) — what a
  * deployment that never re-derived its plan would still be running
  * at 10× the data).
  *
  * Prints one JSON line:
  * {"n":…,"bits":…,"bands":…,"adaptive_cand":…,
  *  "fixed_bits":…,"fixed_bands":…,"fixed_cand":…}
  */
object AdaptiveScaleMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AdaptiveScaleMain <sfDir> [fixedBits fixedBands]")
    val sfDir = args(0)
    val (fixedBits, fixedBands) =
      if (args.length >= 3) (args(1).toInt, args(2).toInt) else (7, 17)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Similarity.plantedVecs(spark, sfDir)
    val n = e.count()
    val (cand, bits, bands) = Similarity.adaptiveCandidates(spark, e)
    val adaptiveCand = cand.count()
    // the fixed plan a never-re-derived deployment would still run
    val sigF = Similarity.srpSignatures(spark, e, fixedBands, fixedBits)
      .persist()
    val fixedCand = sigF.as("x").join(sigF.as("y"),
        org.apache.spark.sql.functions.col("x.band") ===
          org.apache.spark.sql.functions.col("y.band") &&
        org.apache.spark.sql.functions.col("x.sig") ===
          org.apache.spark.sql.functions.col("y.sig") &&
        org.apache.spark.sql.functions.col("x.vec_id") <
          org.apache.spark.sql.functions.col("y.vec_id"))
      .count()
    println(s"""{"n":$n,"bits":$bits,"bands":$bands,""" +
      s""""adaptive_cand":$adaptiveCand,"fixed_bits":$fixedBits,""" +
      s""""fixed_bands":$fixedBands,"fixed_cand":$fixedCand}""")
    spark.stop()
  }
}
