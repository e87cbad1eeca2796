package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.engine.Tables

/** Stateful streaming sessionization via `flatMapGroupsWithState` —
  * the custom-state Structured Streaming shape (per-user session
  * windows with a 30-minute inactivity gap, emitted when the
  * event-time watermark closes them).
  *
  * This is the streaming twin of the batch `evt3_sessions` query
  * (window lag() over user_id): same gap rule, incremental state
  * instead of a sort — the form that runs on an unbounded stream at
  * scale, with state bounded per active user.
  */
object SessionizeStream {

  case class Event(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, lastSeen: Long, nEvents: Long)
  case class SessionOut(user_id: Long, start_ts: Long, end_ts: Long, n_events: Long)

  val GapMs: Long = 30 * 60 * 1000L

  /** Per-user state update: extend the open session or close+emit
    * finished ones. Event-time timeout closes idle sessions once the
    * watermark passes lastSeen + gap. */
  def updateSessions(userId: Long, events: Iterator[Event],
                     state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(SessionOut(userId, s.start, s.lastSeen, s.nEvents))
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var out = List.empty[SessionOut]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastSeen <= GapMs =>
          cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t), nEvents = s.nEvents + 1))
        case Some(s) =>
          out ::= SessionOut(userId, s.start, s.lastSeen, s.nEvents)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach { s =>
      val timeoutAt = s.lastSeen + GapMs
      // GroupStateImpl rejects a timeout at-or-before the current
      // watermark (possible here: the 1 h watermark delay exceeds the
      // 30 min gap, so an allowed late event can yield an already-past
      // timeout). Such a session can never be extended by on-time data
      // — the watermark filter drops anything older — so close and
      // emit it now instead of crashing the query.
      if (state.getCurrentWatermarkMs() >= timeoutAt) {
        out ::= SessionOut(userId, s.start, s.lastSeen, s.nEvents)
        state.remove()
      } else {
        state.update(s)
        state.setTimeoutTimestamp(timeoutAt)
      }
    }
    out.reverseIterator
  }

  /** Streaming sessionizer over an events directory (parquet file
    * source, ts shape adapted by `Tables.readEventsStream`). Emits
    * CLOSED sessions. */
  def sessions(spark: SparkSession, sfDir: String, eventsDir: String,
               maxFilesPerTrigger: Option[Int] = None): Dataset[SessionOut] = {
    import spark.implicits._
    Tables.readEventsStream(spark, eventsDir,
        maxFilesPerTrigger = maxFilesPerTrigger, fallbackSfDir = Some(sfDir))
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateSessions)
  }
}
