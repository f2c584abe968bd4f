package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.MoneyDecimal

/** Incremental aggregate maintenance: the pattern that keeps a 100 TB
  * rollup fresh without re-reading history. The stored STATE is the
  * partial-aggregation form of the rollup — additive counters plus an
  * exact-decimal revenue sum per (hour, event_type) cell — and a new
  * micro-batch/partition folds in with `state ⊕ agg(batch)`: a union of two
  * tiny state relations re-grouped on the cell key, touching no raw
  * history rows. Because every counter is algebraic (sum/count) and the
  * money sum is an exact decimal, the merge is associative and
  * commutative, so maintained-state == full-recompute BIT FOR BIT — which
  * is exactly what the q67 oracle checks (merged halves vs one pass in
  * DuckDB).
  *
  * Deliberate surface difference from q06's `hourlySummary`:
  * `countDistinct(user_id)` is NOT in the state — distinct counts are not
  * additive. The mergeable substitute at scale is a sketch in the state
  * (HLL, as in q35's `approx_count_distinct`) or a two-level
  * (cell, user) pre-aggregation; the op documents instead of silently
  * approximating.
  *
  * Reference anchor: the reference recomputes its analytics views on read
  * (`docker/postgres/postgres_setup.sql:101-110` — plain SQL views); this
  * op is the engine-side upgrade that makes the same hourly surface
  * maintainable per micro-batch.
  */
object Incremental {

  /** The mergeable state of the hourly rollup: one row per
    * (event_hour_ts, event_type) with additive counters. Revenue stays
    * DECIMAL in the state — casting to double per merge would re-round and
    * break merge associativity.
    */
  def hourlyState(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(date_trunc("hour", col("ts")).as("event_hour_ts"), col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        sum(col("total_amount").cast(MoneyDecimal)).as("revenue_state"),
        count(col("user_id")).as("n_user_rows"))

  /** `state ⊕ state` — fold any number of partial states into one. Plans
    * as union + hash agg over cell keys: the shuffle moves only state rows
    * (bounded by hours × types, not by corpus size).
    */
  def merge(states: DataFrame*): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy("event_hour_ts", "event_type")
      .agg(
        sum(col("event_count")).as("event_count"),
        sum(col("revenue_state")).as("revenue_state"),
        sum(col("n_user_rows")).as("n_user_rows"))

  /** Read the state as the user-facing rollup (double revenue, sorted). */
  def readout(state: DataFrame): DataFrame =
    state
      .select(col("event_hour_ts"), col("event_type"), col("event_count"),
        col("revenue_state").cast("double").as("revenue"), col("n_user_rows"))
      .orderBy("event_hour_ts", "event_type")

  /** The graded end-to-end: split the corpus at `cut` into "history" and
    * "new batch", aggregate each side independently, merge the states,
    * read out. The oracle computes the rollup in ONE pass over everything
    * — equality proves the maintenance path is exact, not approximately
    * right.
    */
  def incrementalHourly(enriched: DataFrame, cut: Column): DataFrame = {
    // the split must PARTITION the input: `ts < cut` and `ts >= cut` are
    // both null-false, so a NULL-timestamp row (legal in the schema) would
    // silently vanish from the maintained state while the one-pass oracle
    // keeps it under a NULL hour — route nulls to the history side
    val history = hourlyState(enriched.filter(col("ts") < cut || col("ts").isNull))
    val batch = hourlyState(enriched.filter(col("ts") >= cut))
    readout(merge(history, batch))
  }

  /** Mid-corpus cut for the graded query (the testdata spans 2024-01). */
  val CutTs = "2024-01-16 00:00:00"

  def incrementalHourlySql(enrichedSql: String): String =
    s"""SELECT date_trunc('hour', ts) AS event_hour_ts, event_type,
       |  COUNT(*) AS event_count,
       |  CAST(CAST(SUM(CAST(total_amount AS DECIMAL(22,6))) AS VARCHAR) AS DOUBLE) AS revenue,
       |  COUNT(user_id) AS n_user_rows
       |FROM ($enrichedSql)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
