package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Event-stream analytics over the `events` table: tumbling-window
  * aggregation, typed-property extraction, and gap-based
  * sessionization — batch first (oracle-checked), with the SAME
  * transform runnable under Structured Streaming.
  *
  * The reference has no stream processing (SURVEY §1.1: its only
  * streaming-ish behavior is batched online retraining, mapped to
  * `planopt.Pipelines.deploymentLoop`); this module covers the
  * driver-brief side: `readStream` → watermarked windowed aggregate →
  * sink, the Spark-native shape for the events table the testdata
  * ships.
  *
  * Determinism rules as everywhere: window starts surface as epoch
  * seconds (BIGINT both engines; timestamp precision differs — Spark
  * micros vs DuckDB nanos), money-ish sums in DECIMAL, property
  * extraction via regexp_extract with the same pattern both sides.
  *
  * Scale: windowed aggregation shuffles on (window, event_type) —
  * bounded keys; sessionization shuffles on user_id and sorts within
  * user (the window function's partition), never globally.
  */
object EventStreams {

  /** The shared windowed-aggregate transform: tumbling 1 h windows ×
    * event_type → count + DECIMAL value sum. Works on a batch OR
    * streaming frame (same plan, modulo the stateful agg). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming flavor: parquet file source (a DIRECTORY of event
    * files — the file source tails directories, not single files) →
    * watermark → the same windowed aggregate. `ts` arrives as
    * nanos-long (the parquet files are TIMESTAMP(NANOS)); converted
    * exactly like `Tables.load`. */
  def streamingWindowedAgg(spark: SparkSession, sfDir: String,
                           eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = Tables.load(spark, sfDir, "events").schema // post-conversion schema
    val rawSchema = org.apache.spark.sql.types.StructType(schema.map { f =>
      if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.LongType) else f
    })
    val stream = spark.readStream.schema(rawSchema)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "2 hours")
    windowedAgg(stream)
  }

  /** Streaming exact dedup: `dropDuplicatesWithinWatermark` on the
    * event stream — the streaming twin of dd1's hash-dedup, with
    * state BOUNDED BY THE WATERMARK HORIZON instead of corpus size
    * (at 100 TB/day ingest, an unbounded dedup state is the classic
    * streaming OOM; within-watermark is the shape that holds: a
    * duplicate arriving later than the lateness bound is by contract
    * allowed through, and everything inside it is exact). */
  def streamingDedup(spark: SparkSession, sfDir: String,
                     eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = Tables.load(spark, sfDir, "events").schema
    val rawSchema = org.apache.spark.sql.types.StructType(schema.map { f =>
      if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.LongType) else f
    })
    spark.readStream.schema(rawSchema)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling-window aggregate (batch flavor of the streaming shape)
    "evt1_window_agg" -> ((spark, sfDir) =>
      windowedAgg(Tables.load(spark, sfDir, "events"))),
    // typed property extraction from the JSON-ish props column
    "evt2_props_extract" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "events")
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).cast("long").as("k_sum"),
          max(col("k")).as("k_max"))),
    // gap-based sessionization: a new session starts after >30 min of
    // user inactivity; top-20 users by session count
    "evt3_sessions" -> ((spark, sfDir) =>
      Tables.sql(spark, sfDir,
        """SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions FROM (
          |  SELECT user_id,
          |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |              IS NULL
          |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |              > INTERVAL 30 MINUTES
          |         THEN 1 ELSE 0 END AS new_session
          |  FROM events
          |) WHERE new_session = 1
          |GROUP BY user_id
          |ORDER BY n_sessions DESC, user_id LIMIT 20""".stripMargin))
  )

  val oracle: Map[String, String] = Map(
    "evt1_window_agg" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "evt2_props_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
        |  CAST(max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS k_max
        |FROM events GROUP BY event_type""".stripMargin,
    "evt3_sessions" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions FROM (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              IS NULL
        |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |) WHERE new_session = 1
        |GROUP BY user_id
        |ORDER BY n_sessions DESC, user_id LIMIT 20""".stripMargin
  )
}
