package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization and event-time attribution over the events table.
  *
  * Both ops are single-shuffle window pipelines: everything happens inside
  * one `partitionBy(user_id)` sort — the one shuffle a per-user timeline
  * computation fundamentally needs — and scales by user cardinality, not
  * by any global sort. This complements the fixed-30-minute-bucket
  * `session_id` the reference derives per event
  * (spark/processing/transformations.py-style floor(epoch/1800), our
  * q03/q07): gap-based sessions are the semantically honest version —
  * a session ends only after true inactivity, not at arbitrary wall-clock
  * boundaries — and are what Structured Streaming's
  * `session_window(ts, gap)` computes; this batch form pins the same
  * semantics against an exact oracle.
  */
object Sessionize {
  val GapMinutes = 30

  /** Gap-based sessions: a new session starts when a user has been idle
    * for [[GapMinutes]] or more — the half-open convention of Spark's
    * native `session_window` (an event at exactly start+gap begins a new
    * session), so the two formulations agree on every input, boundary
    * included (proven in CurationOpsSpec). Deterministic under timestamp
    * ties (secondary order on event_id). Null-user events have no
    * timeline and are excluded.
    */
  def gapSessions(events: DataFrame): DataFrame = {
    val timeline = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val running = timeline.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.filter(col("user_id").isNotNull)
      .withColumn("prev_ts", lag("ts", 1).over(timeline))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          col("ts") >= col("prev_ts") + expr(s"INTERVAL $GapMinutes MINUTE")).cast("int"))
      .withColumn("session_seq", sum("new_session").over(running).cast("int"))
      .groupBy("user_id", "session_seq")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_seq")
  }

  /** The shared inner derivation (lag → gap-break flag → running sum):
    * the single source of truth for the gap constant and the half-open
    * boundary, consumed by BOTH the q48 oracle and the q55
    * (session_window) oracle so the two can never drift apart.
    */
  def sessionDerivationSql: String =
    s"""SELECT user_id, ts,
       |    CAST(SUM(new_session) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER)
       |      AS session_seq
       |  FROM (
       |    SELECT user_id, ts, event_id,
       |      CASE WHEN prev_ts IS NULL
       |             OR ts >= prev_ts + INTERVAL $GapMinutes MINUTE
       |           THEN 1 ELSE 0 END AS new_session
       |    FROM (
       |      SELECT user_id, ts, event_id,
       |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |          AS prev_ts
       |      FROM events WHERE user_id IS NOT NULL))""".stripMargin

  def gapSessionsSql: String =
    s"""SELECT user_id, session_seq,
       |  MIN(ts) AS session_start, MAX(ts) AS session_end,
       |  COUNT(*) AS n_events
       |FROM (
       |$sessionDerivationSql)
       |GROUP BY user_id, session_seq
       |ORDER BY user_id, session_seq""".stripMargin

  /** Generic as-of (point-in-time) join: for every `probes` row, attach
    * the `payload` columns of the latest `quotes` row with the same `key`
    * whose `quoteTs` ≤ the probe's `probeTs` (nulls when no quote
    * qualifies) — the lookup every feature-store, attribution and
    * market-data pipeline needs, and an operator Spark has no built-in
    * for.
    *
    * Implemented the scalable way: instead of a per-probe range join
    * (O(probes × quotes) worst case, a BroadcastNestedLoopJoin in Spark),
    * both sides are unioned onto one per-key timeline and
    * `last(payload, ignoreNulls)` over the running window carries the
    * latest quote forward — ONE shuffle on the key, linear work, identical
    * semantics. Ties are pinned: a quote sharing the probe's timestamp
    * counts ("at or before": quotes sort before probes at equal time), and
    * among equal-time quotes the greatest `tieBreak` wins. Probe columns
    * ride the timeline inside a struct, so arbitrary probe schemas work.
    */
  def asofJoin(
      probes: DataFrame, quotes: DataFrame, key: String,
      probeTs: String, quoteTs: String,
      payload: Seq[(String, String)], tieBreak: String): DataFrame = {
    val quoteSchema = quotes.schema
    def payloadNull(src: String) =
      lit(null).cast(quoteSchema(src).dataType)
    val probeSide = probes.select(
      (Seq(col(key).as("__k"), col(probeTs).as("__t"), lit(1).as("__m"),
        lit(null).cast(quoteSchema(tieBreak).dataType).as("__tie"),
        struct(probes.columns.map(col): _*).as("__probe")) ++
        payload.map { case (src, dst) => payloadNull(src).as(dst) }): _*)
    val quoteSide = quotes.select(
      (Seq(col(key).as("__k"), col(quoteTs).as("__t"), lit(0).as("__m"),
        col(tieBreak).as("__tie"),
        lit(null).cast(probeSide.schema("__probe").dataType).as("__probe")) ++
        payload.map { case (src, dst) => col(src).as(dst) }): _*)
    val running = Window.partitionBy("__k")
      .orderBy("__t", "__m", "__tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(quoteSide.unionByName(probeSide)) {
      case (df, (_, dst)) =>
        df.withColumn(dst, last(dst, ignoreNulls = true).over(running))
    }
    carried.filter(col("__m") === 1)
      .select(col("__probe.*") +: payload.map(p => col(p._2)): _*)
  }

  /** As-of attribution: each purchase is credited to the user's most
    * recent `view` at or before the purchase time — [[asofJoin]] applied
    * to the events table. Among equal-time views the highest event_id
    * wins. DuckDB expresses the same plan with IGNORE NULLS (its native
    * ASOF JOIN leaves equal-key ties unspecified, so the oracle mirrors
    * the window form instead).
    */
  def viewAttribution(events: DataFrame): DataFrame = {
    val e = events.filter(col("user_id").isNotNull)
    val views = e.filter(col("event_type") === "view")
    val purchases = e.filter(col("event_type") === "purchase")
    asofJoin(purchases, views, key = "user_id",
        probeTs = "ts", quoteTs = "ts",
        payload = Seq("event_id" -> "attr_view_id", "ts" -> "attr_view_ts"),
        tieBreak = "event_id")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("attr_view_id"), col("attr_view_ts"))
      .orderBy("purchase_id")
  }

  def viewAttributionSql: String =
    """SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
      |  attr_view_id, attr_view_ts
      |FROM (
      |  SELECT user_id, ts, event_id, marker,
      |    last_value(view_event_id IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, marker, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_view_id,
      |    last_value(view_ts IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, marker, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_view_ts
      |  FROM (
      |    SELECT user_id, ts, event_id, 0 AS marker,
      |      event_id AS view_event_id, ts AS view_ts
      |    FROM events WHERE user_id IS NOT NULL AND event_type = 'view'
      |    UNION ALL
      |    SELECT user_id, ts, event_id, 1 AS marker,
      |      CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP)
      |    FROM events WHERE user_id IS NOT NULL AND event_type = 'purchase'))
      |WHERE marker = 1 ORDER BY purchase_id""".stripMargin
}
