package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.engine.Tables

/** Stateful streaming funnel via `mapGroupsWithState` — the streaming
  * twin of the batch `evt4_funnel` query. Per-user state is just
  * (stage, timestamp-that-reached-it): the greedy stage machine the
  * batch query runs over a collected sequence becomes an incremental
  * update here, so an unbounded stream carries O(1) state per user
  * instead of a growing event list.
  *
  * Semantics match batch when events arrive in order (or within one
  * micro-batch, which sorts); a cross-batch late event older than the
  * current stage's timestamp cannot retroactively rewind the funnel —
  * the standard streaming-funnel approximation. No state timeout is
  * set (the fixture is bounded); production would add an idle-user
  * event-time timeout exactly like [[SessionizeStream]].
  */
object FunnelStream {

  case class FEvent(user_id: Long, ts: Long, code: Int)
  case class FunnelState(stage: Int, stageTs: Long)
  case class FunnelOut(user_id: Long, stage: Int)

  /** Greedy advance: stage 0→1 on any view; k→k+1 on the next
    * click/purchase STRICTLY after the event that reached stage k
    * (the batch query's `>` — equal timestamps cannot advance). */
  def updateFunnel(userId: Long, events: Iterator[FEvent],
                   state: GroupState[FunnelState]): FunnelOut = {
    var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
    events.toSeq.sortBy(e => (e.ts, e.code)).foreach { e =>
      s = (s.stage, e.code) match {
        case (0, 1) => FunnelState(1, e.ts)
        case (1, 2) if e.ts > s.stageTs => FunnelState(2, e.ts)
        case (2, 3) if e.ts > s.stageTs => FunnelState(3, e.ts)
        case _ => s
      }
    }
    state.update(s)
    FunnelOut(userId, s.stage)
  }

  /** Streaming funnel over an events directory (parquet file source,
    * ts shape adapted by `Tables.readEventsStream`). Emits each
    * user's current stage every trigger (stage is monotone, so the
    * latest row per user is also the max). */
  def funnel(spark: SparkSession, sfDir: String, eventsDir: String,
             maxFilesPerTrigger: Option[Int] = None): Dataset[FunnelOut] = {
    import spark.implicits._
    Tables.readEventsStream(spark, eventsDir,
        maxFilesPerTrigger = maxFilesPerTrigger, fallbackSfDir = Some(sfDir))
      .select(col("user_id"), unix_micros(col("ts")).as("ts"),
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2)
          .when(col("event_type") === "purchase", 3).as("code"))
      .filter(col("code").isNotNull)
      .as[FEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateFunnel)
  }
}
