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

    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
    println("docs=" + docs.count())
    for (pass <- 1 to 2) {
      spark.catalog.clearCache()
      val tf = docs
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
        .filter(length(col("term")) >= 3)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .persist()
      val nTf = t(s"p$pass tf materialize")(tf.count())
      println(s"p$pass tf rows=$nTf")
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      t(s"p$pass dl agg")(noop(dl))
      t(s"p$pass totals")(dl.agg(sum(col("dl")), count(lit(1))).collect())
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      t(s"p$pass dfreq agg")(noop(dfreq))
      t(s"p$pass qterms")(dfreq.orderBy(col("df").desc, col("term")).limit(20).collect())
      // raw explode cost without agg
      t(s"p$pass raw explode")(noop(docs
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
        .filter(length(col("term")) >= 3)))
    }
    spark.stop()
  }
}
