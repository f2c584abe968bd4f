package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.WindowedAggs.{SessionEvent, SessionOut}

class WindowedAggsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling hourly window == date_trunc buckets (batch mode)") {
    val df = Seq(
      (1L, ts("2024-01-10 10:05:00"), 7L, "view", 5.0, "{}"),
      (2L, ts("2024-01-10 10:55:00"), 8L, "view", 3.0, "{}"),
      (3L, ts("2024-01-10 11:05:00"), 7L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = WindowedAggs.hourlyWindowed(df)
      .collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("event_count"), r.getAs[Double]("total_value")))
      .sortBy(x => (x._1.getTime, x._2))
    assert(got.toSeq == Seq(
      (ts("2024-01-10 10:00:00"), "view", 2L, 8.0),
      (ts("2024-01-10 11:00:00"), "click", 1L, 2.0)))
  }

  test("sliding window emits one row per covering slide") {
    val df = Seq((1L, ts("2024-01-10 10:20:00"), 7L, "view", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // 1h window sliding 15min → an event is covered by 4 windows
    assert(WindowedAggs.slidingActivity(df).count() == 4)
  }

  test("windowed agg runs as a real stream with watermark (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = WindowedAggs.hourlyWindowed(events)
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("hourly_out").start()
    try {
      mem.addData((1L, ts("2024-01-10 10:05:00"), 7L, "view", 5.0, "{}"))
      q.processAllAvailable()
      // watermark still at epoch → window not closed yet in append mode
      assert(spark.table("hourly_out").count() == 0)
      // an event far in the future advances the watermark past hour 10
      mem.addData((2L, ts("2024-01-10 13:00:00"), 7L, "view", 1.0, "{}"))
      q.processAllAvailable()
      mem.addData((3L, ts("2024-01-10 14:00:00"), 7L, "view", 1.0, "{}"))
      q.processAllAvailable()
      val closed = spark.table("hourly_out")
        .collect().map(r => r.getAs[Timestamp]("window_start")).toSet
      assert(closed.contains(ts("2024-01-10 10:00:00")))
    } finally q.stop()
  }

  test("declarative session_window sessions emit in append mode on watermark passage") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val q = WindowedAggs.sessionWindowed(
        mem.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("swin_out").start()
    try {
      mem.addData((1L, 7L, ts("2024-01-10 10:00:00")),
        (2L, 7L, ts("2024-01-10 10:10:00")))
      q.processAllAvailable()
      // push the watermark (12:00 − 30min = 11:30) past the open session's
      // close (10:10 + gap = 10:40) → the session emits
      mem.addData((3L, 9L, ts("2024-01-10 12:00:00")))
      q.processAllAvailable()
      val rows = spark.table("swin_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start"),
          r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events")))
      assert(rows.toSet == Set((7L, ts("2024-01-10 10:00:00"),
        ts("2024-01-10 10:10:00"), 2L)))
    } finally q.stop()
  }

  test("sessionization: gap splits in-batch; watermark passage times out open sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = WindowedAggs.sessionize(mem.toDS())
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("sessions_out").start()
    try {
      mem.addData(
        SessionEvent(7L, ts("2024-01-10 10:00:00"), 1.0),
        SessionEvent(7L, ts("2024-01-10 10:10:00"), 2.0), // same session
        SessionEvent(7L, ts("2024-01-10 10:55:00"), 4.0), // >30min gap → new session
        SessionEvent(8L, ts("2024-01-10 10:00:00"), 8.0))
      q.processAllAvailable()
      // the first session of user 7 closed by the in-batch gap
      val closed1 = spark.table("sessions_out").as[SessionOut].collect()
      assert(closed1.length == 1)
      val s = closed1(0)
      assert(s.user_id == 7L && s.n_events == 2 && s.total_value == 3.0)
      assert(s.session_start == ts("2024-01-10 10:00:00"))
      assert(s.session_end == ts("2024-01-10 10:10:00"))
      // advance the watermark past both open sessions' timeout timestamps
      mem.addData(SessionEvent(9L, ts("2024-01-10 12:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData(SessionEvent(9L, ts("2024-01-10 13:00:00"), 0.0))
      q.processAllAvailable()
      val all = spark.table("sessions_out").as[SessionOut].collect()
      val byUser = all.groupBy(_.user_id)
      assert(byUser(7L).length == 2) // gap-split + timed-out tail session
      assert(byUser(8L).length == 1 && byUser(8L)(0).n_events == 1)
    } finally q.stop()
  }
}
