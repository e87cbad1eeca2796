package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main for local iteration — not part of the
  * driver contract. Times sub-stages of whatever is under
  * investigation this round (r12: where the kNN-join family's warm
  * seconds go — pair scoring vs the window top-k machinery).
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

    import graft.pipeline.Similarity
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 3).foreach { pass =>
      spark.catalog.clearCache()
      println(s"--- pass $pass ---")
      // sim4: exact N^2 kNN join — how much is pair scoring, how much
      // is the per-row top-k window?
      val e = Similarity.vecs(spark, sfDir)
      t("vecs count")(println("  n=" + e.count() +
        " partitions=" + e.rdd.getNumPartitions))
      def scoredPairs(streamed: DataFrame) = {
        val a = streamed.select(col("vec_id").as("a_id"), col("v").as("va"),
          expr("sqrt(graft_dot(v, v))").as("na"))
        val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"),
          expr("sqrt(graft_dot(v, v))").as("nb"))
        a.crossJoin(broadcast(b))
          .filter(col("a_id") =!= col("b_id"))
          .select(col("a_id"), col("b_id"),
            (expr("graft_dot(va, vb)") / (col("na") * col("nb"))).as("cos_sim"))
      }
      t("scoring only, streamed side as-read")(
        println("  sum=" + scoredPairs(e).agg(sum("cos_sim")).collect()(0)))
      t("scoring only, streamed side repartitioned")(
        println("  sum=" + scoredPairs(e.repartition(cpus.toInt))
          .agg(sum("cos_sim")).collect()(0)))
      t("sim4 end-to-end (scoring + window top-k)")(noop(
        graft.SparkEntry.queries("sim4_knn_join")(spark, sfDir)))
      t("sim5 end-to-end")(noop(
        graft.SparkEntry.queries("sim5_knn_blocked")(spark, sfDir)))
      t("sim6 end-to-end")(noop(
        graft.SparkEntry.queries("sim6_knn_capped")(spark, sfDir)))
      t("sim7 end-to-end")(noop(
        graft.SparkEntry.queries("sim7_knn_engaged")(spark, sfDir)))
    }
    spark.stop()
  }
}
