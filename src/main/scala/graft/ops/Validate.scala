package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row validation: a first-match-wins `when`-chain producing a
  * `validation_errors` tag column plus an `is_valid` flag, then routing
  * rows into a valid branch and a dead-letter branch.
  *
  * Mirrors the reference's validation CASE-chain
  * (`/root/reference/spark/spark_streaming_to_postgres.py:99-143`, rule
  * constants at `:58-65`), adapted to the testdata `events` schema
  * (`price`→`value`, login-required events = purchase/signup).
  * Single pass, pure Column expressions — stays inside whole-stage codegen.
  */
object Validate {
  val ValidEventTypes: Seq[String] = Seq("view", "click", "purchase", "signup", "error")
  val LoginRequiredEvents: Seq[String] = Seq("purchase", "signup")
  val MaxReasonableValue = 400.0

  /** Adds `validation_errors` (null ⇔ valid) and `is_valid`. */
  def withValidation(df: DataFrame): DataFrame =
    df.withColumn(
        "validation_errors",
        when(col("event_id").isNull, "null_event_id")
          .when(col("event_type").isNull, "null_event_type")
          .when(!col("event_type").isin(ValidEventTypes: _*), "invalid_event_type")
          .when(
            col("event_type").isin(LoginRequiredEvents: _*) && col("user_id").isNull,
            "missing_user_id")
          .when(col("value").isNull, "null_value")
          .when(col("value") < 0, "negative_value")
          .when(col("value") > MaxReasonableValue, "extreme_value")
          .when(col("event_type") === "purchase" && col("value") <= 0, "purchase_zero_value")
          .otherwise(lit(null).cast("string")))
      .withColumn("is_valid", col("validation_errors").isNull)

  /** Valid-row branch (main pipeline input). */
  def validRows(df: DataFrame): DataFrame =
    withValidation(df).filter(col("is_valid"))

  /** Dead-letter branch (rejected rows + their error tag). */
  def deadLetter(df: DataFrame): DataFrame =
    withValidation(df).filter(!col("is_valid"))

  /** The same rule chain as ANSI SQL (for DuckDB oracles); CASE has the
    * identical first-match-wins semantics.
    */
  val validationCaseSql: String =
    s"""CASE
       |  WHEN event_id IS NULL THEN 'null_event_id'
       |  WHEN event_type IS NULL THEN 'null_event_type'
       |  WHEN event_type NOT IN ('view','click','purchase','signup','error') THEN 'invalid_event_type'
       |  WHEN event_type IN ('purchase','signup') AND user_id IS NULL THEN 'missing_user_id'
       |  WHEN value IS NULL THEN 'null_value'
       |  WHEN value < 0 THEN 'negative_value'
       |  WHEN value > $MaxReasonableValue THEN 'extreme_value'
       |  WHEN event_type = 'purchase' AND value <= 0 THEN 'purchase_zero_value'
       |  ELSE NULL
       |END""".stripMargin
}
