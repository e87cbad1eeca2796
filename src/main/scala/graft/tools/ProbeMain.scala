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

    val cust = graft.engine.Tables.load(spark, sfDir, "customer")
    val base = cust.select(col("c_custkey"), col("c_name").as("n"))
    val varying = (10 to 18).toSeq

    def litPairs(n: String): String = {
      val pats = for { a <- varying.indices; b <- a + 1 until varying.length }
        yield {
          val i = varying(a); val j = varying(b)
          s"concat(substr($n, 1, ${i - 1}), '*', substr($n, ${i + 1}, ${j - i - 1}), '*', substr($n, ${j + 1}))"
        }
      pats.mkString("array(", ",\n", ")")
    }
    def hofPairs(n: String): String = {
      val pairsLit = (for { a <- varying.indices; b <- a + 1 until varying.length }
        yield s"struct(${varying(a)} as i, ${varying(b)} as j)").mkString("array(", ",", ")")
      s"""transform($pairsLit, p ->
         |  concat(substr($n, 1, p.i - 1), '*',
         |         substr($n, p.i + 1, p.j - p.i - 1), '*',
         |         substr($n, p.j + 1)))""".stripMargin
    }
    val a = base.limit(50).select(explode(expr(litPairs("n"))).as("k")).collect().map(_.getString(0)).sorted.toSeq
    val b = base.limit(50).select(explode(expr(hofPairs("n"))).as("k")).collect().map(_.getString(0)).sorted.toSeq
    println(s"values equal: ${a == b} (n=${a.length})")
    for (pass <- 1 to 2) {
      t(s"p$pass LIT36 emit")(noop(base.select(col("c_custkey"), explode(expr(litPairs("n"))).as("k"))))
      t(s"p$pass HOF36 emit")(noop(base.select(col("c_custkey"), explode(expr(hofPairs("n"))).as("k"))))
    }
    spark.stop()
  }
}
