package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: dd2 cold-time breakdown at sf0.1. */
object StatsProbe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.registerAll(spark, sfDir)
    spark.sql("SELECT count(*) FROM lineitem").collect()

    import graft.pipeline.Dedup
    for (i <- 1 to 3) {
      spark.catalog.clearCache(); System.gc()
      t(s"dd2 full run$i") {
        graft.SparkEntry.queries("dd2_ngram_jaccard")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.catalog.clearCache(); System.gc()
    val sets = t("shingleSets materialize") {
      val s = Dedup.shingleSets(spark, sfDir); println(s.count()); s
    }
    val cand = t("cappedCandidates") {
      val c = Dedup.cappedCandidates(Dedup.shingles(spark, sfDir))
      println(c.count()); c
    }
    t("verify join") {
      println(Dedup.verifiedPairs(sets, cand, 0.8).count())
    }
    spark.stop()
  }
}
