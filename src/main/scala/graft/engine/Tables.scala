package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry over the driver-generated parquet testdata
  * (TESTDATA.md). Mirrors the reference's catalog bootstrap — the
  * PG-side `information_schema` introspection in
  * `/root/reference/pg.py:72-101` — except the "catalog" here is
  * parquet files registered as temp views, which is the Spark-native
  * analog.
  *
  * Scale note: at 100 TB these would be partitioned/bucketed external
  * tables; reading via `spark.read.parquet` keeps partition pruning
  * and filter pushdown available to Catalyst, and nothing below ever
  * collects table data to the driver.
  */
object Tables {
  /** All tables present in every sf dir (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at ANY scale factor —
    * region/nation are bounded by geography (25/5 rows at every sf),
    * so `broadcast()` on them is safe even at 100 TB.
    */
  val alwaysBroadcast: Set[String] = Set("region", "nation")

  def path(sfDir: String, table: String): String = s"$sfDir/$table.parquet"

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    if (table == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
      // default. Read nanos as long, then convert losslessly to a
      // microsecond timestamp (the data carries no sub-us precision;
      // integer `div` — double division would lose bits above 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(sfDir, table))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(path(sfDir, table))
    }

  /** Register every table as a temp view named after the table, so
    * `spark.sql` text (the reference's native query surface) resolves.
    * Idempotent per (session, sfDir).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = synchronized {
    val key = "graft.views.dir"
    if (!spark.conf.getOption(key).contains(sfDir)) {
      names.foreach { t =>
        load(spark, sfDir, t).createOrReplaceTempView(t)
      }
      spark.conf.set(key, sfDir)
    }
  }

  /** Run reference-shaped SQL (comma-FROM implicit joins included —
    * Spark's parser handles them natively; Catalyst's ReorderJoin /
    * PushPredicateThroughJoin recover the inner equi-joins, cf.
    * SURVEY.md §2.1 J1).
    */
  def sql(spark: SparkSession, sfDir: String, text: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(text)
  }
}
