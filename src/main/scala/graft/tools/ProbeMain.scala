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

    // g2 join-shape probe: AQE's broadcast of the 600k-row lineitem
    // side vs a merge-hinted self-join (whose second exchange is a
    // ReusedExchange of the first)
    import org.apache.spark.sql.functions._
    (1 to 2).foreach { pass =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      println(s"--- pass $pass ---")
      t("g2 current (AQE choice)")(noop(
        graft.SparkEntry.queries("g2_copurchase")(spark, sfDir)))
      val li = graft.engine.Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val l2 = li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("p2"))
      t("g2 merge-hinted")(noop(
        li.hint("merge").join(l2,
            col("l_orderkey") === col("ok2") && col("l_partkey") < col("p2"))
          .groupBy(col("l_partkey").as("p1"), col("p2"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("p1"), col("p2")).limit(25)))
      t("g2 shuffle-hash-hinted")(noop(
        li.hint("shuffle_hash").join(l2,
            col("l_orderkey") === col("ok2") && col("l_partkey") < col("p2"))
          .groupBy(col("l_partkey").as("p1"), col("p2"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("p1"), col("p2")).limit(25)))
    }
    spark.stop()
  }
}
