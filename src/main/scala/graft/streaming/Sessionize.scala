package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful event-time sessionization over the `events` stream shape
  * (event_id, ts, user_id, event_type, value) — the
  * `flatMapGroupsWithState` custom-state pattern: a per-user session is held
  * in typed state, closed either by an in-stream gap or by event-time
  * timeout once the watermark passes last_ts + gap.
  *
  * Works identically on a batch Dataset (Spark runs the same function
  * per group) — tested both ways.
  */
object Sessionize {

  final case class Event(userId: Long, ts: Timestamp, eventType: String)
  final case class SessionState(start: Long, last: Long, events: Long)
  final case class Session(userId: Long, start: Timestamp, end: Timestamp, events: Long)

  def updateUser(gapMs: Long, finalizeAtEnd: Boolean)(userId: Long, rows: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    val out = List.newBuilder[Session]

    if (rows.isEmpty && state.hasTimedOut) {
      state.getOption.foreach { s =>
        out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.events)
      }
      state.remove()
      return out.result().iterator
    }

    var cur = state.getOption
    rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last > gapMs =>
          out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.events)
          cur = Some(SessionState(t, t, 1))
        case Some(s) =>
          // a late event can precede the stored session start — extend BOTH
          // bounds so the emitted window covers every counted event
          cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.events + 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach { s =>
      if (finalizeAtEnd) {
        // BATCH: timeouts never fire and this group is never re-invoked —
        // the open trailing session must be emitted now or it is silently
        // lost (setTimeoutTimestamp is a silent no-op in batch execution)
        out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.events)
        state.remove()
      } else {
        state.update(s)
        // streaming: close via event-time timeout once the watermark passes
        state.setTimeoutTimestamp(s.last + gapMs)
      }
    }
    out.result().iterator
  }

  /** Streaming (or batch) sessionization; input must carry a watermark on
    * `ts` when streaming. Batch inputs finalize trailing sessions at group
    * end, so batch output covers every event (matches the SQL-window twin). */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        updateUser(gapMs, finalizeAtEnd = !events.isStreaming))
  }
}
