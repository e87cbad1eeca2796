package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.registerAll(spark, sfDir)

    import graft.planopt._
    import graft.queries.Relational
    val names = Seq("j1_join_2way", "j1_join_5way", "j1_join_7way",
      "a2_min_join", "q2_join_group_topn")
    val qs: Seq[(String, SparkSession => DataFrame)] =
      names.map(n => n -> ((s: SparkSession) => Relational.defs(n)(s, sfDir)))
    val labeled = Pipelines.labelWorkload(spark, qs, new Pipelines.Logger(None))
    labeled.foreach { lq =>
      println(s"PROBE ${lq.qid}: " + lq.latenciesMs.map(_.round).mkString(","))
    }
    val (fg, model) = Pipelines.train(labeled, epochs = 40)

    // library-path choice for j7
    val build = (s: SparkSession) => Relational.defs("j1_join_7way")(s, sfDir)
    val cands = Candidates.enumerate(spark, build)
    val scores = model.predict(cands.map(c => fg.transform(c.plan)))
    println("PROBE library candidates:")
    cands.zip(scores).foreach { case (c, s) =>
      println(f"  score=$s%.4f knobs=${c.knobs.label}")
    }

    // in-engine routing
    graft.plans.PlanChoice.install(model, fg)
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new graft.engine.GraftExtensions)
      .getOrCreate()
    s2.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.registerAll(s2, sfDir)
    names.foreach { n =>
      graft.plans.PlanChoice.lastChoice.set(None)
      Relational.defs(n)(s2, sfDir).write.format("noop").mode("overwrite").save()
      val c = graft.plans.PlanChoice.lastChoice.get()
      println(s"PROBE routed $n: " + c.map(ch =>
        s"chose [${ch.knobLabel}] of ${ch.nCandidates}, scores=" +
          ch.scores.map(x => f"$x%.4f").mkString(",")).getOrElse("none"))
    }
    graft.plans.PlanChoice.uninstall()
    spark.stop()
  }
}
