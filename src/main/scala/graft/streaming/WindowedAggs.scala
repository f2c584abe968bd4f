package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Deterministic.dsum

/** Streaming windowed aggregations and custom sessionization state.
  *
  * The reference buckets hours with `DATE_TRUNC` in Postgres views
  * (`postgres_setup.sql:103,142`) and sessions with a 30-minute epoch
  * bucket in its generator; on a stream the idiomatic Spark forms are
  * `window()` grouping under a watermark (state bounded, emitted on
  * watermark passage in append mode) and
  * `flatMapGroupsWithState` for gap-based sessions (true session semantics
  * the reference's fixed buckets only approximate).
  *
  * Scale notes: windowed aggregation shuffles once on (window, key) with
  * map-side partial aggregation; sessionization shuffles once on the user
  * key and its state store holds one open session per active user —
  * bounded by the processing-time timeout, not by history length.
  */
object WindowedAggs {

  /** Tumbling-window event counts + revenue by type under a watermark.
    * Works on streaming AND batch frames (batch: watermark is a no-op) —
    * the batch path makes the same code oracle-testable.
    */
  def hourlyWindowed(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("event_count"), dsum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("event_count"), col("total_value"))

  /** Sliding-window (1 hour, sliding 15 min) distinct-user activity —
    * STREAMING form: `approx_count_distinct` (HLL++) because exact distinct
    * aggregation is not mergeable under incremental streaming state. The
    * sketch is why this query is rows-only at the oracle; the exact batch
    * twin is [[slidingActivityExact]].
    */
  def slidingActivity(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(approx_count_distinct("user_id").as("active_users"),
        count(lit(1)).as("event_count"))
      .select(col("w.start").as("window_start"), col("active_users"), col("event_count"))

  /** The exact BATCH/backfill twin of [[slidingActivity]]: same sliding
    * windows, exact `count_distinct` (one shuffle on the window key with
    * partial aggregation; the 4× window fan-out happens map-side). This is
    * the variant a backfill or reconciliation job runs — and it is fully
    * oracle-checkable, pinning the window assignment semantics that the
    * sketch variant shares.
    */
  def slidingActivityExact(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count_distinct(col("user_id")).as("active_users"),
        count(lit(1)).as("event_count"))
      .select(col("w.start").as("window_start"), col("active_users"), col("event_count"))

  /** DuckDB mirror of [[slidingActivityExact]]: each event belongs to the
    * four 15-min-aligned window starts in (ts−1h, ts]; `time_bucket`'s
    * 2000-01-01 origin is 900-second-aligned with Spark's epoch-0 grid.
    */
  def slidingActivityExactSql: String =
    s"""SELECT window_start, COUNT(DISTINCT user_id) AS active_users, COUNT(*) AS event_count
       |FROM (
       |  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - (k * INTERVAL 15 MINUTE) AS window_start,
       |    user_id
       |  FROM events, unnest(generate_series(0, 3)) AS t(k))
       |GROUP BY window_start ORDER BY window_start""".stripMargin

  // ---------------------------------------------------------------- state

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  final case class SessionState(
      start: Long, lastSeen: Long, nEvents: Long, totalValue: Double)

  final case class SessionOut(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long,
      total_value: Double)

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Declarative gap sessionization on Spark's native `session_window` —
    * the built-in merging-window operator (streaming-capable with a
    * watermark; state = one open window per active user). Batch-runnable
    * with identical semantics, which is how the oracle pins it: the DuckDB
    * side re-derives sessions from first principles (lag + running sum of
    * gap breaks), so Spark's built-in window-merging is cross-checked
    * against an independent formulation — and CurationOpsSpec proves it
    * equal to [[graft.ops.Sessionize.gapSessions]] as well.
    */
  def sessionWindowed(
      events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events.filter(col("user_id").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")

  def sessionWindowedSql: String =
    s"""SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events
      |FROM (
      |${graft.ops.Sessionize.sessionDerivationSql})
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_start""".stripMargin

  /** Gap-based sessionization with explicit state: events for a user extend
    * the open session while they arrive within the gap; a gap — or the
    * event-time watermark passing lastSeen+gap — closes and emits it. One
    * state entry per active user. Event-time timeouts are data-driven
    * (watermark advancement), so there are no wall-clock-dependent empty
    * micro-batches and results are deterministic.
    */
  def sessionize(
      events: Dataset[SessionEvent], watermark: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastSeen), s.nEvents, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // strict <: the half-open session_window convention (an
                // event at exactly lastSeen+gap opens a new session), so
                // all three sessionizers in this repo agree on every input
                case Some(s) if t - s.lastSeen < SessionGapMs =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1, totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.lastSeen), s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // must be strictly beyond the current watermark
              state.setTimeoutTimestamp(
                math.max(s.lastSeen + SessionGapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
