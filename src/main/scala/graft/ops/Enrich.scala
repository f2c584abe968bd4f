package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment stage: timestamp parsing/time-parts, normalization,
  * derived monetary amount, late-arrival flagging, session derivation and
  * null-defaulting.
  *
  * Mirrors the reference's `transform_and_enrich`
  * (`/root/reference/spark/spark_streaming_to_postgres.py:151-233`) over the
  * testdata `events` schema. All pure built-in Column expressions
  * (codegen'd); no UDFs.
  *
  * Determinism: "now" is the literal [[Enrich.AnchorTs]] instead of
  * `current_timestamp()` so oracle queries are reproducible
  * (SURVEY.md §7 determinism rules). The nondeterministic lineage variants
  * (`processed_at`, `source_file`) live in [[lineage]] and are exercised by
  * ScalaTest only, never by oracle-checked queries.
  */
object Enrich {
  /** Deterministic "now": just past the last event in the testdata (events
    * span 2024-01-01 .. 2024-01-30 at every scale factor).
    */
  val AnchorTs = "2024-01-31 00:00:00"

  /** Late-arrival threshold, reference default 5 minutes
    * (`spark_streaming_to_postgres.py:209`).
    */
  val LateMinutes = 5

  /** Session bucket width in seconds (reference generator buckets sessions
    * as `epoch // 1800`, `data_generator/data_generator.py:81-88`).
    */
  val SessionBucketSec = 1800

  /** F5 — strip everything that is neither word nor whitespace. ONE shared
    * pattern string feeds Spark (Java regex) and the DuckDB oracle (RE2):
    * `\w` means the same in both, but `\s` does not (Java includes \x0B,
    * RE2 does not), so whitespace is spelled out.
    */
  val PropsCleanRegex = "[^\\w \\t\\n\\x0B\\f\\r]"

  /** Batch/oracle form: "now" pinned to the deterministic anchor. */
  def enriched(df: DataFrame): DataFrame =
    enrichedAt(df, lit(AnchorTs).cast("timestamp"))

  /** Streaming form: pass `current_timestamp()` (or any Column) as "now"
    * for the late-arrival comparison (reference `:207-210`).
    */
  def enrichedAt(df: DataFrame, now: Column): DataFrame =
    df.withColumn("event_type", lower(trim(col("event_type"))))
      .withColumn("quantity", coalesce(get_json_object(col("props"), "$.k").cast("int"), lit(0)))
      .withColumn(
        "total_amount",
        when(col("event_type").isin("purchase", "click"), col("value") * col("quantity"))
          .otherwise(lit(0.0)))
      .withColumn("event_year", year(col("ts")))
      .withColumn("event_month", month(col("ts")))
      .withColumn("event_day", dayofmonth(col("ts")))
      .withColumn("event_hour", hour(col("ts")))
      .withColumn("event_dayofweek", dayofweek(col("ts")))
      .withColumn(
        "is_late_arrival",
        col("ts") < now - expr(s"INTERVAL $LateMinutes MINUTES"))
      .withColumn(
        "session_id",
        concat(col("user_id").cast("string"), lit("-"),
          floor(unix_timestamp(col("ts")) / SessionBucketSec).cast("long").cast("string")))
      .withColumn("props_clean", regexp_replace(col("props"), PropsCleanRegex, ""))

  /** F9 — null-defaulting of the enrichment columns the reference fills
    * (`spark_streaming_to_postgres.py:213-231`): coalesce to semantic
    * defaults. Applied post-migration so registry-added nulls become the
    * reference's defaults.
    */
  val NullDefaults: Map[String, String] = Map(
    "category" -> "unknown",
    "user_segment" -> "unknown",
    "search_query" -> "",
    "session_id" -> "unknown",
    "source_system" -> "unknown")

  def withNullDefaults(df: DataFrame): DataFrame =
    NullDefaults.foldLeft(df) { case (acc, (c, d)) =>
      if (acc.columns.contains(c)) acc.withColumn(c, coalesce(col(c), lit(d))) else acc
    }

  /** Nondeterministic lineage columns — kept out of oracle-checked
    * projections (reference `:164-170`).
    */
  def lineage(df: DataFrame): DataFrame =
    df.withColumn("processed_at", current_timestamp())
      .withColumn("source_file", input_file_name())
}
