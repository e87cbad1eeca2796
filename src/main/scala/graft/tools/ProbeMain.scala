package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch probe — rewritten per investigation; not part of any gate. */
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

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // dd6 decomposition: how much is dd3's candidate path, how much
    // the verify, how much the CC loop?
    (1 to 2).foreach { pass =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      println(s"--- pass $pass ---")
      t("dd3 full gate")(noop(
        graft.SparkEntry.queries("dd3_minhash_lsh")(spark, sfDir)))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      t("dd6 full gate")(noop(
        graft.SparkEntry.queries("dd6_dup_clusters")(spark, sfDir)))
    }
    spark.stop()
  }
}
