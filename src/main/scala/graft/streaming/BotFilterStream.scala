package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.engine.Tables

/** Stateful streaming bot detector via `mapGroupsWithState` — the
  * streaming twin of the batch `evt8_bot_filter` burst rule. Per-user
  * state is (current minute, its running count, sticky bot flag) —
  * O(1) per user regardless of history length, the shape a rate
  * limiter at the edge of a 100 TB/day event firehose runs. A user is
  * flagged the moment any single minute accumulates
  * [[EventStreams.BotBurstThreshold]] events; the flag is STICKY
  * (once a bot, always a bot — matching the batch rule, which scans
  * all history), so the emitted flag is monotone and the latest row
  * per user is also the max.
  *
  * Cross-batch ordering: within a micro-batch events sort by minute
  * before counting; a cross-batch late event for a minute the user
  * already moved past is SKIPPED — it cannot re-open that minute's
  * count (state keeps only the current minute) and, crucially, it
  * cannot reset the live minute's accumulation either (the guard in
  * [[updateBot]]) — the standard streaming-rate-limit approximation,
  * exact whenever a burst lands inside one watermark horizon. The
  * burst minute itself spans micro-batches fine: an unchanged minute
  * keeps accumulating. No state timeout is set (the
  * fixture is bounded); production adds an idle-user event-time
  * timeout exactly like [[SessionizeStream]].
  */
object BotFilterStream {

  case class BEvent(user_id: Long, minute: Long)
  case class BotState(minute: Long, count: Int, bot: Boolean)
  case class BotOut(user_id: Long, is_bot: Boolean)

  def updateBot(userId: Long, events: Iterator[BEvent],
                state: GroupState[BotState]): BotOut = {
    var s = state.getOption.getOrElse(BotState(Long.MinValue, 0, bot = false))
    events.toSeq.sortBy(_.minute).foreach { e =>
      // a cross-batch LATE event (older than the open minute) is
      // skipped: it can neither re-open its own minute (that count is
      // gone — the documented approximation) nor RESET the live
      // minute's accumulation. Without this guard one stale event
      // between two halves of a burst would zero the count and let
      // the burst escape the flag.
      if (e.minute >= s.minute) {
        s = if (e.minute == s.minute) s.copy(count = s.count + 1)
            else BotState(e.minute, 1, s.bot)
        if (s.count >= EventStreams.BotBurstThreshold) s = s.copy(bot = true)
      }
    }
    state.update(s)
    BotOut(userId, s.bot)
  }

  /** Streaming bot flags over an events directory (parquet file
    * source, ts shape adapted by `Tables.readEventsStream`).
    * `maxFilesPerTrigger` goes to the SOURCE (a sink-side option is
    * silently ignored) — the spec uses it to force the burst across
    * micro-batches. */
  def bots(spark: SparkSession, sfDir: String, eventsDir: String,
           maxFilesPerTrigger: Option[Int] = None): Dataset[BotOut] = {
    import spark.implicits._
    Tables.readEventsStream(spark, eventsDir,
        maxFilesPerTrigger = maxFilesPerTrigger,
        fallbackSfDir = Some(sfDir))
      .select(col("user_id"),
        expr("unix_micros(ts) div 60000000").as("minute"))
      .as[BEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateBot)
  }
}
