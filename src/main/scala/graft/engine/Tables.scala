package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry over the driver-generated parquet testdata
  * (TESTDATA.md). Mirrors the reference's catalog bootstrap — the
  * PG-side `information_schema` introspection in
  * `/root/reference/pg.py:72-101` — except the "catalog" here is
  * parquet-backed catalog tables with computed CBO statistics, which
  * is the Spark-native analog of PG's `ANALYZE`d catalog.
  *
  * Relational tables are registered as unmanaged catalog tables and
  * `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`d so that
  * `spark.sql.cbo.enabled` + `joinReorder` get real row counts / NDVs
  * — without stats, multi-way comma-FROM join order is a FROM-clause
  * heuristic that does not survive a 100× scale-up (r01 verdict on
  * `j1_join_7way`). `events` needs a read-time nanos→micros rewrite,
  * so it stays a temp view over the converted frame.
  *
  * Scale note: at 100 TB these would be partitioned/bucketed external
  * tables; the catalog-table + ANALYZE path here is exactly that shape,
  * and nothing below ever collects table data to the driver.
  */
object Tables {
  /** All tables present in every sf dir (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at ANY scale factor —
    * region/nation are bounded by geography (5/25 rows at every sf),
    * so `broadcast()` on them is safe even at 100 TB.
    */
  val alwaysBroadcast: Set[String] = Set("region", "nation")

  /** Tables that need a read-time rewrite and so cannot be plain
    * parquet-location catalog tables. */
  private val viewOnly: Set[String] = Set("events")

  def path(sfDir: String, table: String): String = s"$sfDir/$table.parquet"

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    // Parquet timestamp[ms] without tz infers as TIMESTAMP_NTZ by
    // default; CBO's FilterEstimation MatchErrors on TimestampNTZType
    // (Spark bug), and the session tz is pinned to UTC so LTZ is
    // value-identical. Read everything as LTZ.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if (table == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
      // default. Read nanos as long, then convert losslessly to a
      // microsecond timestamp (the data carries no sub-us precision;
      // integer `div` — double division would lose bits above 2^53).
      // `div` TRUNCATES toward zero while the DuckDB oracles' `//`
      // FLOORS: identical for the post-epoch data this corpus
      // guarantees, one microsecond apart for a pre-1970 ts off a
      // 1000 ns boundary — if this loader ever meets pre-epoch data,
      // switch to floor(ts / 1000) semantics here first.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(sfDir, table))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(path(sfDir, table))
    }
  }

  /** `load` + broadcast hint when the table is a bounded dim (uses
    * [[alwaysBroadcast]]). */
  def loadDim(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = load(spark, sfDir, table)
    if (alwaysBroadcast(table)) broadcast(df) else df
  }

  // Guard keyed on the actual (session, sfDir) pair — a session-conf
  // key (r01) re-registered all ten tables whenever sfDirs alternated.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register every table so `spark.sql` text (the reference's native
    * query surface) resolves: catalog tables + ANALYZE for the stats-
    * bearing relational tables, temp views for the rewrite-needing
    * ones. Enables CBO + join reorder on the session. Idempotent per
    * (session, sfDir).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (registered.get(spark) == sfDir) return
    graft.functions.CosineSimilarity.register(spark) // native fn library
    graft.functions.DotProduct.register(spark)
    graft.functions.HyperplaneBands.register(spark)
    graft.functions.CollectCappedLongs.register(spark)
    graft.functions.SortedIntersectCount.register(spark)
    graft.functions.MinHashSketch.register(spark)
    graft.functions.SimHashSketch.register(spark)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    names.foreach { t =>
      if (viewOnly(t)) {
        load(spark, sfDir, t).createOrReplaceTempView(t)
      } else {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        // Unmanaged (LOCATION) table: DROP never touches the read-only
        // testdata; schema is inferred from the parquet footer.
        spark.sql(
          s"CREATE TABLE $t USING parquet LOCATION '${path(sfDir, t)}'")
        // Column NDV/min/max feed CBO joinReorder; fall back to
        // table-level stats for tables with non-analyzable columns
        // (e.g. embeddings.embedding ARRAY<FLOAT>).
        try spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
        catch { case _: Exception =>
          spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
        }
      }
    }
    registered.put(spark, sfDir)
  }

  /** Run reference-shaped SQL (comma-FROM implicit joins included —
    * Spark's parser handles them natively; Catalyst's ReorderJoin /
    * PushPredicateThroughJoin recover the inner equi-joins, cf.
    * SURVEY.md §2.1 J1; with ANALYZE stats, CBO joinReorder picks a
    * cardinality-driven order instead of FROM-clause order).
    */
  def sql(spark: SparkSession, sfDir: String, text: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(text)
  }
}
