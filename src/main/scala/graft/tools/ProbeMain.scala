package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe — rewritten per investigation; not part of any gate. */
object ProbeMain {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

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
    for (pass <- 1 to 2) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val sets = Dedup.shingleSets(spark, sfDir)
      t(s"p$pass shingleSets materialize")(sets.count())
      val ex = Dedup.shingles(spark, sfDir)
      t(s"p$pass shingles explode scan")(noop(ex))
      val sigs = Dedup.minhashSignatures(ex)
      t(s"p$pass minhash signatures")(noop(sigs))
      val banded = Dedup.bandedSignatures(ex)
      t(s"p$pass banded persist")(banded.count())
      val cand = Dedup.bandedCandidates(ex)
      t(s"p$pass banded candidates")(noop(cand))
      val ver = Dedup.verifiedPairs(sets, cand, 0.8)
      t(s"p$pass verified pairs")(noop(ver))
    }
    spark.stop()
  }
}
