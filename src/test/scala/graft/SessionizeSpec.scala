package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

class SessionizeSpec extends SparkSpec {

  // base offset keeps the earliest event strictly above the initial
  // watermark (0): a row exactly AT the watermark is dropped as late
  private def ts(sec: Long) = new Timestamp((86400L + sec) * 1000L)

  test("streaming: sessions close on in-stream gaps and on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "10 seconds").as[Event], gapMs = 30000L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // u1: two events 5s apart (one session); u2: one event
      input.addData(Event(1, ts(0), "view"), Event(1, ts(5), "click"), Event(2, ts(2), "view"))
      q.processAllAvailable()
      // u1's next event 100s later closes the first session in-stream and the
      // watermark (100-10=90 > 5+30) times out u2's session
      input.addData(Event(1, ts(100), "view"))
      q.processAllAvailable()
      input.addData(Event(3, ts(300), "view")) // advance watermark further
      q.processAllAvailable()

      val got = spark.sql("SELECT * FROM sessions").as[Session].collect()
        .map(s => (s.userId, s.start.getTime, s.end.getTime, s.events)).toSet
      assert(got.contains((1L, ts(0).getTime, ts(5).getTime, 2L)), got)
      assert(got.contains((2L, ts(2).getTime, ts(2).getTime, 1L)), got)
      // u1's second session (t=100) closes once the watermark passes 130
      assert(got.contains((1L, ts(100).getTime, ts(100).getTime, 1L)), got)
    } finally q.stop()
  }

  test("batch: sorted-fold path sessionizes a static dataset, incl. trailing sessions") {
    import spark.implicits._
    val events = Seq(
      Event(7, ts(0), "a"), Event(7, ts(10), "b"), Event(7, ts(100), "c"),
      Event(8, ts(50), "a")
    ).toDS()
    val ds = Sessionize.sessions(events, gapMs = 30000L)
    // batch dispatches to the sorted-partition fold, NOT the stateful group
    // function (whose timeouts never fire in batch and which buffers whole
    // users on one heap)
    assert(!ds.queryExecution.executedPlan.toString.contains("FlatMapGroupsWithState"))
    val got = ds.collect().map(s => (s.userId, s.start.getTime, s.events)).toSet
    assert(got.contains((7L, ts(0).getTime, 2L)))
    // batch has no timeouts — the trailing (still-open) sessions must be
    // emitted at input end, not silently dropped
    assert(got.contains((7L, ts(100).getTime, 1L)))
    assert(got.contains((8L, ts(50).getTime, 1L)))
    assert(got.size === 3)
  }

  test("batch: one degenerate hot user streams through the fold (bounded task memory)") {
    import spark.implicits._
    // 400k events for ONE user — the group-buffering formulation holds all
    // of them on a single task's heap; the fold emits sessions incrementally
    // as the sorted iterator advances. Every 10th event opens a new session.
    val n = 400000
    val events = spark.range(n.toLong).select(
      lit(77L).as("userId"),
      // i -> 1s steps inside a 10-event run, 111s gap between runs (> gapMs)
      // → exactly n/10 sessions; cast-from-long interprets SECONDS
      (lit(86400L) + floor(col("id") / 10) * 120 + (col("id") % 10))
        .cast("timestamp").as("ts"),
      lit("e").as("eventType")
    ).as[Event]
    val sessions = Sessionize.sessions(events, gapMs = 30000L).collect()
    assert(sessions.length === n / 10)
    assert(sessions.forall(s => s.userId == 77L && s.events == 10L))
  }

  test("late out-of-order event extends the session START, not just the end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "60 seconds").as[Event], gapMs = 30000L)
    val q = sessions.writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Event(9, ts(100), "view"))
      q.processAllAvailable()
      // a LATE event (t=95 < stored start=100) that is still inside the
      // watermark joins the session and must pull start back to 95
      input.addData(Event(9, ts(95), "view"))
      q.processAllAvailable()
      input.addData(Event(10, ts(500), "view")) // advance watermark → timeout
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM late_sessions").as[Session].collect()
        .map(s => (s.userId, s.start.getTime, s.end.getTime, s.events)).toSet
      assert(got.contains((9L, ts(95).getTime, ts(100).getTime, 2L)), got)
    } finally q.stop()
  }
}
