package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: where does the injected session's residual warm
  * overhead come from — planning or execution? */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    def mkSession(ext: Boolean): SparkSession = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val b = SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", 16)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "false")
      val b2 = if (ext) b.withExtensions(new graft.engine.GraftExtensions) else b
      val s = b2.getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      graft.engine.Tables.registerAll(s, sfDir)
      s
    }
    val sqlText =
      """SELECT count(*) FROM lineitem l, orders o, customer c, supplier s, nation n
        |WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        |  AND l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey""".stripMargin

    val plain = mkSession(ext = false)
    import graft.planopt._
    val qs = Seq("j1_join_5way").map(n =>
      n -> ((s: SparkSession) => graft.queries.Relational.defs(n)(s, sfDir)))
    val labeled = Pipelines.labelWorkload(plain, qs, new Pipelines.Logger(None))
    val (fg, model) = Pipelines.train(labeled, epochs = 5)

    def bench(s: SparkSession, label: String): Unit = {
      for (i <- 1 to 10) {
        val t0 = System.nanoTime()
        val df = s.sql(sqlText)
        val qe = df.queryExecution
        qe.executedPlan // force planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        if (i > 5) println(f"PROBE $label run$i plan=${(t1 - t0) / 1e6}%.1fms " +
          f"exec=${(t2 - t1) / 1e6}%.1fms")
      }
    }
    bench(plain, "plain")
    graft.plans.PlanChoice.install(model, fg)
    val ext = mkSession(ext = true)
    bench(ext, "injected")
    bench(plain, "plain2")
    graft.plans.PlanChoice.uninstall()
    plain.stop()
  }
}
