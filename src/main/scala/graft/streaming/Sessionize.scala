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

  def updateUser(gapMs: Long)(userId: Long, rows: Iterator[Event],
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
    // per-MICRO-BATCH buffer+sort: bounded by one user's events within one
    // trigger interval (watermark-bounded), unlike batch mode where a hot
    // user's whole history would land here — that's why the batch path below
    // is a sorted-partition fold instead of this group function
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
      state.update(s)
      // close via event-time timeout once the watermark passes
      state.setTimeoutTimestamp(s.last + gapMs)
    }
    out.result().iterator
  }

  /** Batch sessionization as a sorted-partition fold: repartition by user,
    * sort within partitions on (user, ts) — ONE shuffle + external sort, both
    * spill-safe — then a constant-memory iterator fold that closes a session
    * on user change or gap. A degenerate hot user (10⁸ events) streams
    * through the fold at O(1) heap, where a group-buffering formulation
    * (`rows.toSeq.sortBy` per group) would hold the whole user on one task's
    * heap. */
  def sessionsBatch(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .repartition(org.apache.spark.sql.functions.col("userId"))
      .sortWithinPartitions("userId", "ts")
      .mapPartitions { it =>
        new Iterator[Session] {
          private var cur: Option[(Long, SessionState)] = None
          private var pendingEmit: Option[Session] = None
          private def close(u: Long, s: SessionState): Session =
            Session(u, new Timestamp(s.start), new Timestamp(s.last), s.events)
          private def advance(): Unit = {
            while (pendingEmit.isEmpty && it.hasNext) {
              val e = it.next()
              val t = e.ts.getTime
              cur match {
                case Some((u, s)) if u != e.userId =>
                  pendingEmit = Some(close(u, s))
                  cur = Some((e.userId, SessionState(t, t, 1)))
                case Some((u, s)) if t - s.last > gapMs =>
                  pendingEmit = Some(close(u, s))
                  cur = Some((u, SessionState(t, t, 1)))
                case Some((u, s)) =>
                  cur = Some((u, SessionState(s.start, math.max(s.last, t), s.events + 1)))
                case None =>
                  cur = Some((e.userId, SessionState(t, t, 1)))
              }
            }
            if (pendingEmit.isEmpty && !it.hasNext) {
              // input exhausted: flush the trailing open session
              pendingEmit = cur.map { case (u, s) => close(u, s) }
              cur = None
            }
          }
          def hasNext: Boolean = {
            if (pendingEmit.isEmpty) advance()
            pendingEmit.nonEmpty
          }
          def next(): Session = {
            if (!hasNext) throw new NoSuchElementException
            val s = pendingEmit.get
            pendingEmit = None
            s
          }
        }
      }
  }

  /** Streaming (or batch) sessionization; input must carry a watermark on
    * `ts` when streaming. Batch inputs take the sorted-fold path
    * ([[sessionsBatch]]) — same sessions, bounded task memory — because
    * state timeouts never fire in batch execution (setTimeoutTimestamp is a
    * silent no-op there) and the group function would buffer whole users. */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    if (!events.isStreaming) sessionsBatch(events, gapMs)
    else events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        updateUser(gapMs))
  }
}
