package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join pairs purchases with in-horizon views only") {
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val pMem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Joins.attribution(
      vMem.toDF().toDF(cols: _*), pMem.toDF().toDF(cols: _*))
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attr_out").start()
    try {
      // user 7: view at 10:00; purchases at 10:10 (in horizon) and 11:30
      // (outside). user 8: purchase with NO prior view → no row.
      vMem.addData((1L, ts("2024-01-10 10:00:00"), 7L, "view", 0.0, "{}"))
      pMem.addData((2L, ts("2024-01-10 10:10:00"), 7L, "purchase", 9.5, "{}"))
      pMem.addData((3L, ts("2024-01-10 11:30:00"), 7L, "purchase", 1.0, "{}"))
      pMem.addData((4L, ts("2024-01-10 10:10:00"), 8L, "purchase", 2.0, "{}"))
      q.processAllAvailable()
      // advance both watermarks far enough to flush results
      vMem.addData((5L, ts("2024-01-10 14:00:00"), 99L, "view", 0.0, "{}"))
      pMem.addData((6L, ts("2024-01-10 14:00:00"), 99L, "purchase", 0.0, "{}"))
      q.processAllAvailable()
      val rows = spark.table("attr_out")
        .collect().map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id")))
      assert(rows.contains((2L, 1L)))          // in-horizon match
      assert(!rows.map(_._1).contains(3L))      // beyond 30 min → unmatched
      assert(!rows.map(_._1).contains(4L))      // no view for user 8
    } finally q.stop()
  }

  test("left-outer interval join emits never-converted views after the horizon closes") {
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val pMem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = Joins.attributionOuter(
        vMem.toDF().toDF(cols: _*), pMem.toDF().toDF(cols: _*))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attr_outer").start()
    try {
      // user 7 converts in-horizon; user 9's view never converts
      vMem.addData((1L, ts("2024-01-10 10:00:00"), 7L, "view", 0.0, "{}"))
      vMem.addData((2L, ts("2024-01-10 10:00:00"), 9L, "view", 0.0, "{}"))
      pMem.addData((3L, ts("2024-01-10 10:10:00"), 7L, "purchase", 9.5, "{}"))
      q.processAllAvailable()
      val before = spark.table("attr_outer")
        .filter("purchase_id IS NULL").count()
      assert(before == 0) // unmatched view NOT emitted while it could still match
      // advance both watermarks well past view_ts + horizon + delay
      vMem.addData((4L, ts("2024-01-10 20:00:00"), 99L, "view", 0.0, "{}"))
      pMem.addData((5L, ts("2024-01-10 20:00:00"), 99L, "purchase", 0.0, "{}"))
      q.processAllAvailable()
      val rows = spark.table("attr_outer").collect()
      val unmatched = rows.filter(_.isNullAt(0)).map(_.getAs[Long]("view_id"))
      assert(unmatched.contains(2L)) // the never-converted view surfaces
      assert(rows.exists(r => !r.isNullAt(0) &&
        r.getAs[Long]("purchase_id") == 3L && r.getAs[Long]("view_id") == 1L))
    } finally q.stop()
  }

  test("interval-join state is evicted once the watermark passes the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val pMem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = Joins.attribution(
        vMem.toDF().toDF(cols: _*), pMem.toDF().toDF(cols: _*))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attr_evict").start()
    try {
      vMem.addData((1L, ts("2024-01-10 10:00:00"), 7L, "view", 0.0, "{}"))
      // push BOTH watermarks hours past view_ts + horizon + watermark delay
      vMem.addData((2L, ts("2024-01-10 20:00:00"), 99L, "view", 0.0, "{}"))
      pMem.addData((3L, ts("2024-01-10 20:00:00"), 99L, "purchase", 0.0, "{}"))
      q.processAllAvailable()
      // a late purchase that WOULD have matched the evicted view
      pMem.addData((4L, ts("2024-01-10 10:10:00"), 7L, "purchase", 9.5, "{}"))
      q.processAllAvailable()
      val matched = spark.table("attr_evict")
        .collect().map(_.getAs[Long]("purchase_id"))
      assert(!matched.contains(4L)) // state for the 10:00 view is gone
    } finally q.stop()
  }
}
