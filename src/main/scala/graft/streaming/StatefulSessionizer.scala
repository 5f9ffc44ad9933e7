package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState —
  * the custom-state streaming surface (SURVEY §2.10 capability note).
  * Same 30-minute-gap semantics as the batch `StreamOps.sessionize`;
  * sessions are emitted once the event-time watermark passes their
  * close (end + gap), driven by event-time timeouts.
  */
object StatefulSessionizer {

  final case class Event(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, end: Long, n: Long) // micros
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  val GapMicros: Long = 1800L * 1000000L

  /** java.sql.Timestamp keeps sub-second precision in nanos — getTime
    * alone would truncate to millis and break exact batch parity.
    */
  private def toMicros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L

  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Insert one event into the ascending-by-start open-session list:
    * it extends every session whose gap-widened interval
    * [start-gap, end+gap] contains t — at most a contiguous run, and
    * possibly TWO sessions, which the event then bridges into one.
    * This is exact batch-gap semantics for out-of-order events: a
    * head-only fold would mint a spurious session for any in-watermark
    * event older than the newest session's start.
    */
  private def insert(ss: List[SessionState], t: Long): List[SessionState] = {
    val (before, rest) = ss.span(_.end + GapMicros < t)
    val (mergeable, after) = rest.span(_.start - GapMicros <= t)
    val merged =
      if (mergeable.isEmpty) SessionState(t, t, 1L)
      else SessionState(math.min(mergeable.head.start, t),
        math.max(mergeable.last.end, t), mergeable.map(_.n).sum + 1L)
    before ::: merged :: after
  }

  def updateState(userId: Long, events: Iterator[Event],
      state: GroupState[List[SessionState]]): Iterator[Session] = {
    var sessions = state.getOption.getOrElse(Nil) // ascending by start
    if (!state.hasTimedOut)
      events.foreach(e => sessions = insert(sessions, toMicros(e.ts)))
    val watermarkUs = state.getCurrentWatermarkMs() * 1000L
    val (closed, open) = sessions.partition(_.end + GapMicros < watermarkUs)
    if (open.isEmpty) state.remove()
    else {
      state.update(open)
      // wake when the EARLIEST open session becomes closable — keying
      // on the newest would withhold older idle sessions until the
      // newest also went quiet
      val timeoutMs = math.max(open.map(_.end).min / 1000L + GapMicros / 1000L,
        state.getCurrentWatermarkMs() + 1L)
      state.setTimeoutTimestamp(timeoutMs)
    }
    closed.iterator.map(s => Session(userId,
      fromMicros(s.start), fromMicros(s.end), s.n))
  }

  /** Wire the stateful sessionizer over a watermarked event stream. */
  def sessions(spark: SparkSession, events: Dataset[Event]): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateState)
  }
}
