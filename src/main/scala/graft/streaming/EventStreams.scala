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
    * watermark → the same windowed aggregate. The ts physical shape
    * (nanos-long vs native timestamp) is adapted by
    * `Tables.readEventsStream`, same branch as the batch loader. */
  def streamingWindowedAgg(spark: SparkSession, sfDir: String,
                           eventsDir: String): DataFrame =
    windowedAgg(Tables.readEventsStream(spark, eventsDir,
        fallbackSfDir = Some(sfDir))
      .withWatermark("ts", "2 hours"))

  /** Streaming exact dedup: `dropDuplicatesWithinWatermark` on the
    * event stream — the streaming twin of dd1's hash-dedup, with
    * state BOUNDED BY THE WATERMARK HORIZON instead of corpus size
    * (at 100 TB/day ingest, an unbounded dedup state is the classic
    * streaming OOM; within-watermark is the shape that holds: a
    * duplicate arriving later than the lateness bound is by contract
    * allowed through, and everything inside it is exact). */
  def streamingDedup(spark: SparkSession, sfDir: String,
                     eventsDir: String): DataFrame =
    Tables.readEventsStream(spark, eventsDir, fallbackSfDir = Some(sfDir))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** View→click interval join: every (click, preceding view within
    * 10 min, same user) pair. Batch shape of the stream-stream join
    * below; one shuffle per side on user_id, the range condition is
    * a post-join filter inside the same sort-merge join. */
  def viewClickPairs(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
    clicks.join(views, col("user_id") === col("v_user") &&
      col("v_ts") >= col("c_ts") - expr("INTERVAL 10 MINUTES") &&
      col("v_ts") < col("c_ts"))
  }

  /** Stream-stream inner interval join — the Structured Streaming
    * surface the other twins don't cover. Both sides carry a
    * watermark AND the join condition bounds event-time distance, so
    * Spark can evict view state older than watermark−10 min and
    * click state at the watermark: state is bounded by the lateness
    * horizon, not the stream length — the property that makes a
    * stream-stream join survive an unbounded 100 TB/day feed. */
  def streamingViewClickJoin(spark: SparkSession, sfDir: String,
                             eventsDir: String,
                             joinType: String = "inner",
                             maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // probe the footer ONCE: probing per side would read the dir twice
    // and could hand the two join sides different ts types if the dir
    // is rewritten between probes
    val footer = Tables.eventsStreamFooter(spark, eventsDir)
    def src(): DataFrame =
      Tables.readEventsStream(spark, eventsDir, maxFilesPerTrigger,
        fallbackSfDir = Some(sfDir), probedFooter = footer)
    val clicks = src().filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "2 hours")
    val views = src().filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
      .withWatermark("v_ts", "2 hours")
    // LEFT OUTER adds the state-EVICTION semantics: a click with no
    // view in its window emits (c_id, null) once the watermark
    // passes the point where a matching view can no longer arrive —
    // the same horizon that bounds the state, so unmatched-side
    // output is as watermark-driven as the cleanup.
    clicks.join(views, expr(
      "c_user = v_user AND v_ts >= c_ts - INTERVAL 10 MINUTES AND v_ts < c_ts"),
      joinType)
      .select(col("c_id"), col("v_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling-window aggregate (batch flavor of the streaming shape)
    "evt1_window_agg" -> ((spark, sfDir) =>
      windowedAgg(Tables.load(spark, sfDir, "events"))),
    // view→click interval join rolled up per click hour (batch
    // flavor of the stream-stream join; sub-microsecond boundary
    // ties are the same accepted risk as evt3's 30-min gap — the
    // corpus has none at any SF)
    "evt6_view_click_join" -> ((spark, sfDir) =>
      viewClickPairs(Tables.load(spark, sfDir, "events"))
        .groupBy(unix_timestamp(date_trunc("hour", col("c_ts")))
          .as("click_hour"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("c_id")).as("n_clicks"))
        .orderBy(col("click_hour"))),
    // typed property extraction from the JSON-ish props column
    "evt2_props_extract" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "events")
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).cast("long").as("k_sum"),
          max(col("k")).as("k_max"))),
    // Ordered-funnel analysis: how many users had a view, then a
    // click AFTER that first view, then a purchase AFTER that click.
    // One shuffle: events (filtered to the 3 funnel stages map-side)
    // group to per-user time-sorted sequences and a higher-order
    // aggregate runs the greedy stage machine — equivalent to the
    // oracle's stage-wise min-timestamp formulation because taking
    // the EARLIEST event at each stage dominates. Per-user state is
    // bounded by that user's funnel-event count (the sessionizer's
    // caveat applies: a bot user with millions of events would get a
    // per-(user, day) pre-funnel before this plan at 100 TB). The
    // corpus has no equal-timestamp (user, ts) pairs at any SF —
    // checked down to the microsecond — so Spark's micros and the
    // oracle's nanos order identically and strict '>' is safe.
    "evt4_funnel" -> ((spark, sfDir) => {
      val staged = Tables.load(spark, sfDir, "events")
        .select(col("user_id"), col("ts"),
          when(col("event_type") === "view", 1)
            .when(col("event_type") === "click", 2)
            .when(col("event_type") === "purchase", 3).as("code"))
        .filter(col("code").isNotNull)
      staged
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("ts"), col("code"))))
          .as("seq"))
        .withColumn("stage", expr(
          """aggregate(seq, 0, (st, e) -> case
            |  when st = 0 and e.code = 1 then 1
            |  when st = 1 and e.code = 2 then 2
            |  when st = 2 and e.code = 3 then 3
            |  else st end)""".stripMargin))
        .agg(sum(when(col("stage") >= 1, 1L).otherwise(0L)).as("reached_view"),
          sum(when(col("stage") >= 2, 1L).otherwise(0L)).as("reached_click"),
          sum(when(col("stage") >= 3, 1L).otherwise(0L)).as("reached_purchase"))
    }),
    // Last-touch attribution: each purchase credits the most recent
    // PRECEDING view/click of the same user. The preceding-touch
    // timestamp comes from a running conditional max over the
    // user-ordered window (one shuffle on user_id); resolving the
    // touch's channel is an equi-join on (user_id, src_ts) — exact
    // because (user, ts) is unique in this corpus. The oracle is
    // independently formulated (per-purchase LATERAL top-1 lookup),
    // so the window formulation is genuinely cross-checked.
    "evt5_attribution" -> ((spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.load(spark, sfDir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val purchases = e
        .withColumn("src_ts",
          max(when(col("event_type").isin("view", "click"), col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("src_ts"))
      val touches = e.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts").as("src_ts"),
          col("event_type").as("channel"))
      purchases.join(touches, Seq("user_id", "src_ts"), "left")
        .groupBy(coalesce(col("channel"), lit("none")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"))
        .orderBy(col("channel"))
    }),
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
          |ORDER BY n_sessions DESC, user_id LIMIT 20""".stripMargin)),
    // Weekly cohort retention — the product-analytics capstone: cohort
    // = Monday-truncated week of each user's FIRST event; each
    // (cohort, week-offset) cell counts distinct users active that
    // week. Two shuffles, both user-keyed: the min-agg building
    // cohorts (partial-aggregated map-side) and the activity join +
    // countDistinct, which co-partition on user_id; the final
    // (cohort, offset) agg has a weeks²-bounded key space — tiny at
    // any corpus size. The week-offset division is exact: both
    // operands are Monday-truncated epochs, so their difference is a
    // multiple of 604800 and the double quotient is integral.
    "evt7_retention" -> ((spark, sfDir) => {
      val e = Tables.load(spark, sfDir, "events")
      val cohorts = e.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort"))
      e.join(cohorts, Seq("user_id"))
        .groupBy(unix_timestamp(col("cohort")).as("cohort_week"),
          ((unix_timestamp(date_trunc("week", col("ts"))) -
            unix_timestamp(col("cohort"))) / lit(604800)).cast("long")
            .as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),
    // evt8: BURST-RATE BOT FILTERING — the traffic-cleaning verb
    // before any event-derived training data is trusted: a user whose
    // per-minute event count ever reaches BotBurstThreshold is a bot;
    // downstream stats split bot vs human traffic per event type. The
    // organic corpus has no bursts (max 2 events/user/minute at every
    // sf), so the gate PLANTS one deterministic bot both engines
    // derive identically (the dd5_blocked_tau09 pattern): every
    // event_id ≡ 0 (mod 83) is cloned to user 9_999_999 with its
    // timestamp compressed into the minute 2024-01-01 00:00
    // (second = event_id mod 60) — a dense burst that must be flagged
    // (recall), while no organic user may be (precision, 5× margin
    // under the threshold). Scale shape: one (user, minute) keyed
    // partial/final count, a per-user max over it (both aggregate
    // streams are user-×-active-minute sized, not corpus-sized), and
    // the bot SET — anomalies, ≪ users — broadcasts back into the
    // corpus pass, so the event stream itself never re-shuffles to be
    // classified (dc1/io8's bounded-side discipline).
    "evt8_bot_filter" -> ((spark, sfDir) => {
      val all = evt8Corpus(spark, sfDir)
      val bots = all
        .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("mn"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= BotBurstThreshold)
        .select(col("user_id")).distinct()
        .withColumn("is_bot", lit(1L))
      all.join(broadcast(bots), Seq("user_id"), "left")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(coalesce(col("is_bot"), lit(0L))).as("n_bot_events"),
          sum(lit(1L) - coalesce(col("is_bot"), lit(0L))).as("n_human_events"),
          countDistinct(when(col("is_bot") === 1L, col("user_id")))
            .as("n_bot_users"))
        .orderBy(col("event_type"))
    }),
    // evt9: RATE-SPIKE ANOMALY DETECTION — the ingest-monitoring verb
    // (alert when a source/type's hourly volume departs its own
    // history; on a 100 TB/day feed this is how pipeline regressions
    // and upstream floods are caught). The 3σ rule is made EXACT
    // integer arithmetic so both engines agree bit-for-bit even at
    // the threshold: with per-(type, hour) count x and per-type
    // window stats (n, S=Σx, Q=Σx²),
    //   z > 3  ⇔  n·x > S  ∧  (n·x − S)² > 9·(n·Q − S²)
    // (both sides of the variance inequality cleared of divisions —
    // no float σ, no rounding flake). A deterministic burst is
    // planted (evt8's fixture pattern): the 'error' events of the
    // corpus's FIRST hour are replicated 4 extra times, so the gate
    // always has a true positive to find on top of the natural 3σ
    // tail. Scale shape: one corpus pass into the (type, hour)
    // hash-agg (partial aggs first, bounded output = types × hours);
    // the per-type stats rollup and the flag join touch only that
    // bounded window table — the raw stream is scanned exactly once.
    "evt9_anomaly" -> ((spark, sfDir) => {
      val e = Tables.load(spark, sfDir, "events")
      val h0 = e.agg(date_trunc("hour", min(col("ts")))).collect().head
        .getTimestamp(0)
      val planted = e
        .filter(col("event_type") === "error" &&
          date_trunc("hour", col("ts")) === lit(h0))
        .withColumn("r", explode(expr("sequence(1, 4)")))
      val base = e.select(col("event_type"), col("ts"))
        .union(planted.select(col("event_type"), col("ts")))
      val w = base
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("win"))
        .agg(count(lit(1)).as("cnt"))
      val st = w.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
          sum(col("cnt") * col("cnt")).as("q"))
      // the variance inequality runs in DECIMAL(38,0): S² wraps BIGINT
      // silently in non-ANSI Spark once a type's window-sum passes
      // ~3·10^9 events (real at 100 TB/day feeds) while DuckDB
      // promotes — decimals keep both engines exact and symmetric
      val Seq(n, s, q, x) = Seq("n", "s", "q", "cnt")
        .map(c => col(c).cast("decimal(38,0)"))
      w.join(st, "event_type")
        .select(col("event_type"), col("win"), col("cnt"),
          when(n * x > s &&
            (n * x - s) * (n * x - s) > lit(9).cast("decimal(38,0)") * (n * q - s * s), 1L)
            .otherwise(0L).as("is_anomaly"))
    })
  )

  /** evt8's burst threshold (events per user per minute). */
  private[streaming] val BotBurstThreshold = 10

  /** evt8's corpus: the organic events plus the planted deterministic
    * bot burst (see the evt8 entry comment) — shared by the batch
    * gate and [[BotFilterStream]]'s spec staging. */
  private[graft] def evt8Corpus(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.load(spark, sfDir, "events")
    val planted = e.filter(col("event_id") % 83 === 0)
      .select((col("event_id") + lit(100000000L)).as("event_id"),
        expr("cast('2024-01-01 00:00:00' as timestamp) + " +
          "make_dt_interval(0, 0, 0, cast(event_id % 60 as double))")
          .as("ts"),
        lit(9999999L).as("user_id"), col("event_type"), col("value"),
        col("props"))
    e.unionByName(planted)
  }

  val oracle: Map[String, String] = Map(
    // stage-wise earliest-timestamp formulation (equivalent to the
    // greedy stage machine — earliest-at-each-stage dominates)
    "evt4_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  GROUP BY e.user_id)
        |SELECT
        |  (SELECT count(*) FROM s1) AS reached_view,
        |  (SELECT count(*) FROM s2) AS reached_click,
        |  (SELECT count(*) FROM s3) AS reached_purchase""".stripMargin,
    // independently formulated: per-purchase LATERAL top-1 lookup of
    // the latest preceding view/click
    "evt5_attribution" ->
      """SELECT coalesce(src.event_type, 'none') AS channel,
        |  CAST(count(*) AS BIGINT) AS n_purchases
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        |  SELECT e.event_type FROM events e
        |  WHERE e.user_id = p.user_id AND e.ts < p.ts
        |    AND e.event_type IN ('view', 'click')
        |  ORDER BY e.ts DESC LIMIT 1) src ON true
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "evt6_view_click_join" ->
      """SELECT CAST(epoch(date_trunc('hour', c.ts)) AS BIGINT) AS click_hour,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(DISTINCT c.event_id) AS BIGINT) AS n_clicks
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts >= c.ts - INTERVAL 10 MINUTES AND v.ts < c.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin,
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
        |ORDER BY n_sessions DESC, user_id LIMIT 20""".stripMargin,
    // both engines truncate weeks to Monday; the offset division is
    // exact (difference of two week-truncated epochs)
    "evt7_retention" ->
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events GROUP BY user_id)
        |SELECT CAST(epoch(f.cohort) AS BIGINT) AS cohort_week,
        |  CAST((epoch(date_trunc('week', e.ts)) - epoch(f.cohort))
        |       / 604800 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same planted bot (event_id mod 83 clones compressed into one
    // minute), same threshold; the interval arithmetic is exact
    // integer seconds in both engines
    "evt8_bot_filter" ->
      """WITH p AS (
        |  SELECT event_id + 100000000 AS event_id,
        |    TIMESTAMP '2024-01-01 00:00:00'
        |      + to_seconds(event_id % 60) AS ts,
        |    CAST(9999999 AS BIGINT) AS user_id, event_type, value, props
        |  FROM events WHERE event_id % 83 = 0),
        |a AS (
        |  SELECT event_id, ts, user_id, event_type, value, props
        |  FROM events
        |  UNION ALL SELECT * FROM p),
        |b AS (
        |  SELECT DISTINCT user_id FROM (
        |    SELECT user_id, date_trunc('minute', ts) AS mn, count(*) AS c
        |    FROM a GROUP BY 1, 2) WHERE c >= 10)
        |SELECT a.event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_bot_events,
        |  CAST(sum(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_human_events,
        |  CAST(count(DISTINCT CASE WHEN b.user_id IS NOT NULL
        |    THEN a.user_id END) AS BIGINT) AS n_bot_users
        |FROM a LEFT JOIN b ON a.user_id = b.user_id
        |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin,
    // evt9: same planted first-hour error burst, same
    // division-free 3σ inequality over (type, hour) counts.
    "evt9_anomaly" ->
      """WITH base AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win
        |  FROM events
        |  UNION ALL
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win
        |  FROM events, (SELECT unnest(range(4)) AS r)
        |  WHERE event_type = 'error'
        |    AND date_trunc('hour', ts) =
        |        (SELECT date_trunc('hour', min(ts)) FROM events)),
        |w AS (SELECT event_type, win, CAST(count(*) AS BIGINT) AS cnt
        |      FROM base GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(cnt) AS DECIMAL(38,0)) AS s,
        |    CAST(sum(cnt * cnt) AS DECIMAL(38,0)) AS q
        |  FROM w GROUP BY 1)
        |SELECT w.event_type, w.win, w.cnt,
        |  CAST(CASE WHEN st.n * w.cnt > st.s
        |    AND (st.n * w.cnt - st.s) * (st.n * w.cnt - st.s)
        |        > 9 * (st.n * st.q - st.s * st.s)
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM w JOIN st USING (event_type)""".stripMargin
  )
}
