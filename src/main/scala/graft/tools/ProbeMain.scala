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

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.registerAll(spark, sfDir)

    // er2 stage decomposition on the dense-id corpus
    val cust = graft.engine.Tables.load(spark, sfDir, "customer")
    def bump(inner: String, off: String): String =
      s"concat(substr($inner, 1, cast(9 + ($off) as int)), " +
        s"cast((cast(substr($inner, cast(10 + ($off) as int), 1) as int) + 1) % 10 as string), " +
        s"substr($inner, cast(11 + ($off) as int)))"
    val p1 = "c_custkey % 9"
    val p2 = s"(c_custkey % 9 + 1 + c_custkey % 8) % 9"
    val dirty = cust
      .filter(substring(md5(col("c_custkey").cast("string").cast("binary")), 1, 1)
        .isin("0", "1", "2", "3"))
      .select((col("c_custkey") + 2000000L).as("dirty_id"),
        expr(bump(bump("c_name", p1), p2)).as("dirty_name"))
    val custNames = cust.select(col("c_custkey"), col("c_name"))
    val len = 18
    def wildPairs(nameCol: String) =
      s"""flatten(transform(sequence(1, ${len - 1}), i ->
         |  transform(sequence(i + 1, $len), j ->
         |    concat(substr($nameCol, 1, i - 1), '*',
         |           substr($nameCol, i + 1, j - i - 1), '*',
         |           substr($nameCol, j + 1)))))""".stripMargin
    def del1(nameCol: String) =
      s"""array_distinct(transform(sequence(1, $len), i ->
         |  concat(substr($nameCol, 1, i - 1), substr($nameCol, i + 1))))""".stripMargin
    def keys(df: DataFrame, nameCol: String, pfx: String, gen: String => String) =
      df.select(col(df.columns.head).as(s"${pfx}_id"),
        explode(expr(gen(nameCol))).as(s"${pfx}_key"))
    def arm(gen: String => String) =
      keys(dirty, "dirty_name", "d", gen)
        .join(keys(custNames, "c_name", "c", gen), col("d_key") === col("c_key"))
        .select(col("d_id").as("dirty_id"), col("c_id").as("c_custkey"))

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      t("dirty count")(println("dirty=" + dirty.count()))
      t("armA keygen d")(println("dkeysA=" + keys(dirty, "dirty_name", "d", wildPairs).count()))
      t("armA keygen c")(println("ckeysA=" + keys(custNames, "c_name", "c", wildPairs).count()))
      t("armA join")(println("armA=" + arm(wildPairs).count()))
      t("armB join")(println("armB=" + arm(del1).count()))
      t("union distinct")(println("cand=" + arm(wildPairs).union(arm(del1)).distinct().count()))
      t("full er2")(graft.SparkEntry.queries("er2_entity_resolution_d2")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
