package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe — rewritten per investigation; not part of any gate. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.registerAll(spark, sfDir)
    import graft.functions.CmsSketch
    CmsSketch.register(spark)

    val D = 4; val W = 8192
    val terms = graft.engine.Tables.load(spark, sfDir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      .filter(length(col("term")) >= 4)
    val sk = terms.select(xxhash64(col("term")).as("k"))
      .agg(expr(s"graft_cms(k, $D, $W)").as("cms"), count(lit(1)).as("n"))
    val row = sk.head
    val cms = row.getSeq[Long](0).toArray
    val n = row.getLong(1)
    println(s"n_total=$n margin2=${(2 * n + W - 1) / W} " +
      s"rowsum=${cms.slice(0, W).sum}")
    val top = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(20).collect()
    // scala-side estimates
    top.foreach { r =>
      val t = r.getString(0); val c = r.getLong(1)
      val k = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        org.apache.spark.unsafe.types.UTF8String.fromString(t).getBaseObject,
        org.apache.spark.unsafe.types.UTF8String.fromString(t).getBaseOffset,
        org.apache.spark.unsafe.types.UTF8String.fromString(t).numBytes, 42L)
      val est = CmsSketch.estimate(cms, W, k)
      println(f"$t%16s exact=$c%6d est=$est%6d over=${est - c}%6d")
    }
    // sql-side estimate for the same probes
    val est = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(20)
      .crossJoin(broadcast(sk))
      .withColumn("est", expr(CmsSketch.estimateSql("cms", "xxhash64(term)", D, W)))
      .select(col("term"), col("c"), col("est")).collect()
    est.foreach(r => println(s"SQL ${r.getString(0)} ${r.getLong(1)} ${r.getLong(2)}"))
    spark.stop()
  }
}
