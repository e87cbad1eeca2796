package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for local iteration — not part of the
  * driver contract. Times sub-stages of whatever is under
  * investigation this round.
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
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.registerAll(spark, sfDir)

    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val ms = (for {s <- info.submissionTime; c <- info.completionTime}
          yield c - s).getOrElse(-1L)
        stages.add((s"stage ${info.stageId} [${info.name.take(60)}] tasks=${info.numTasks}", ms))
      }
    })
    def dumpStages(label: String): Unit = {
      println(s"--- stages for $label ---")
      stages.toArray(Array.empty[(String, Long)]).filter(_._2 > 300)
        .foreach { case (n, ms) => println(f"  $ms%6d ms  $n") }
      stages.clear()
    }

    import graft.pipeline.Dedup
    val sets = Dedup.shingleSets(spark, sfDir)
    t("sets materialize")(println(sets.count()))
    val ex = Dedup.shingles(spark, sfDir)
    t("ex materialize (repart h)")(println(ex.count()))
    stages.clear()
    for (i <- 1 to 4) {
      t(s"dd2 run$i")(println(
        Dedup.verifiedPairs(sets, Dedup.cappedCandidates(ex), 0.8).count()))
      Thread.sleep(200)
      dumpStages(s"run$i")
    }
    t("dd3")(println(graft.SparkEntry.queries("dd3_minhash_lsh")(spark, sfDir).count()))
    spark.stop()
  }
}
