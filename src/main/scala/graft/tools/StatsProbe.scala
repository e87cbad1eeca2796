package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: is the df-capped dd2 candidate generation still
  * lossless vs the unrestricted ground truth at sf0.1? */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.registerAll(spark, sfDir)
    import graft.pipeline.Dedup
    val ex = Dedup.shingles(spark, sfDir)
    val truth = Dedup.exactPairsGroundTruth(ex, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = graft.SparkEntry.queries("dd2_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    println(s"PROBE truth=${truth.size} capped=${capped.size} " +
      s"missed=${(truth -- capped).size} extra=${(capped -- truth).size}")
    (truth -- capped).take(5).foreach(p => println(s"PROBE missed: $p"))
    spark.stop()
  }
}
