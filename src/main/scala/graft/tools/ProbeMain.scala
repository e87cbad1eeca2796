package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main for local iteration — not part of the
  * driver contract. Times sub-stages of whatever is under
  * investigation this round (r6: where dd2_ngram_jaccard's warm
  * seconds go — shingle materialization vs candidate generation vs
  * verification).
  */
object ProbeMain {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.registerAll(spark, sfDir)

    import graft.pipeline.Dedup
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 3).foreach { pass =>
      spark.catalog.clearCache()
      println(s"--- pass $pass ---")
      val sets = Dedup.shingleSets(spark, sfDir)
      t("shingleSets materialize")(sets.count())
      val ex = Dedup.shingles(spark, sfDir)
      t("explode+count shingles")(println("  shingles=" + ex.count()))
      val cand = Dedup.cappedCandidates(ex)
      t("cappedCandidates")(println("  cands=" + cand.count()))
      t("verifiedPairs")(noop(
        Dedup.verifiedPairs(sets, Dedup.cappedCandidates(Dedup.shingles(spark, sfDir)), 0.8)))
      t("dd2 end-to-end")(noop(
        graft.SparkEntry.queries("dd2_ngram_jaccard")(spark, sfDir)))
      // fused vs unrolled minhash signature pass (same JVM, same data)
      t("minhash fused agg")(noop(Dedup.minhashSignatures(ex)))
      t("minhash unrolled 96-col agg")(noop(
        ex.groupBy(col("doc_id"))
          .agg(min(xxhash64(col("h"), lit(0))).as("m0"),
            (1 until 96).map(i =>
              min(xxhash64(col("h"), lit(i))).as(s"m$i")): _*)))
      t("dd3 end-to-end")(noop(
        graft.SparkEntry.queries("dd3_minhash_lsh")(spark, sfDir)))
    }
    spark.stop()
  }
}
