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

    
    // pr2 phase decomposition (NEW build) with bcast vs shj rounds
    val Scale = 1000000000000L
    val ConvDamp = 50L
    val orders = graft.engine.Tables.load(spark, sfDir, "orders")
    val lineitem = graft.engine.Tables.load(spark, sfDir, "lineitem")
    for (pass <- 1 to 2; mode <- Seq("bcast", "shj")) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val e0 = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("src"),
          (col("l_partkey") * 2 + 1).cast("long").as("dst"))
        .distinct()
      val edges = {
        val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        sym.repartition(spark.sparkContext.defaultParallelism, col("dst")).persist()
      }
      val nodes = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        .select(col("src").as("node"), col("outdeg")).persist()
      val n = t(s"p$pass $mode nodes count")(nodes.count())
      println(s"edges parts=${edges.rdd.getNumPartitions} nodes parts=${nodes.rdd.getNumPartitions}")
      val base = ((100L - ConvDamp) * Scale) / (100L * n)
      var ranks = t(s"p$pass $mode ranks0")(nodes.select(col("node"), col("outdeg"),
        lit(Scale / n).as("rank")).localCheckpoint(true))
      // one-round decomposition
      locally {
        val perSrc = ranks.select(col("node"), expr("rank div outdeg").as("c"))
        val shipped = if (mode == "bcast") broadcast(perSrc) else perSrc.hint("shuffle_hash")
        t(s"p$pass $mode D edges-count")(edges.agg(count(lit(1))).head())
        t(s"p$pass $mode D edges-scan-noop")(edges.write.format("noop").mode("overwrite").save())
        val joined = edges.join(shipped, col("src") === col("node"))
        t(s"p$pass $mode D join-noop")(joined.write.format("noop").mode("overwrite").save())
        val contribs = joined.groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
        t(s"p$pass $mode D contribs-noop")(contribs.write.format("noop").mode("overwrite").save())
        val nxt = ranks.join(contribs, col("node") === col("dst"), "left")
          .select(col("node"), col("outdeg"),
            (lit(base) + expr(s"$ConvDamp * coalesce(contrib, 0L) div 100")).cast("long").as("nrank"),
            col("rank").as("prank"))
        t(s"p$pass $mode D next-noop")(nxt.write.format("noop").mode("overwrite").save())
        t(s"p$pass $mode D next-ckpt")(nxt.localCheckpoint(true))
      }
      var rounds = 0L
      var delta = Scale
      while (1000L * delta > Scale && rounds < 24) {
        val perSrc = ranks.select(col("node"), expr("rank div outdeg").as("c"))
        val shipped = if (mode == "bcast") broadcast(perSrc) else perSrc.hint("shuffle_hash")
        val contribs = edges.join(shipped, col("src") === col("node"))
          .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
        val next = t(s"p$pass $mode r$rounds ckpt")(ranks
          .join(contribs, col("node") === col("dst"), "left")
          .select(col("node"), col("outdeg"),
            (lit(base) + expr(s"$ConvDamp * coalesce(contrib, 0L) div 100"))
              .cast("long").as("nrank"),
            col("rank").as("prank"))
          .localCheckpoint(true))
        delta = t(s"p$pass $mode r$rounds delta")(next
          .agg(sum(abs(col("nrank") - col("prank"))).as("d"))
          .head().getLong(0))
        graft.engine.CheckpointBlocks.free(ranks)
        ranks = next.select(col("node"), col("outdeg"), col("nrank").as("rank"))
        rounds += 1
      }
      println(s"pass $pass mode $mode rounds=$rounds")
    }
    spark.stop()
  }
}
