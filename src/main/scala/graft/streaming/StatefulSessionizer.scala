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

  def updateState(userId: Long, events: Iterator[Event],
      state: GroupState[List[SessionState]]): Iterator[Session] = {
    var sessions = state.getOption.getOrElse(Nil) // head = most recent
    if (!state.hasTimedOut) {
      events.toSeq.sortBy(e => toMicros(e.ts)).foreach { e =>
        val t = toMicros(e.ts)
        sessions = sessions match {
          case head :: tail if t - head.end <= GapMicros && t >= head.start =>
            SessionState(head.start, math.max(head.end, t), head.n + 1) :: tail
          case other => SessionState(t, t, 1L) :: other
        }
      }
    }
    val watermarkUs = state.getCurrentWatermarkMs() * 1000L
    val (closed, open) = sessions.partition(_.end + GapMicros < watermarkUs)
    if (open.isEmpty) state.remove()
    else {
      state.update(open)
      // wake up when the newest session becomes closable
      val timeoutMs = math.max(open.map(_.end).max / 1000L + GapMicros / 1000L,
        state.getCurrentWatermarkMs() + 1L)
      state.setTimeoutTimestamp(timeoutMs)
    }
    closed.reverseIterator.map(s => Session(userId,
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
