package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver testdata directories
  * (`/root/testdata/sf*`). Plain `spark.read.parquet` so Catalyst keeps
  * full pushdown (PushedFilters / ReadSchema reach the scan).
  */
object Tables {
  val tpchTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet`'s physical `ts` type has changed between driver
    * testdata generations — INT64 TIMESTAMP(NANOS) first, then
    * Timestamp(isAdjustedToUTC=false, µs) which Spark 4 reads as
    * TIMESTAMP_NTZ. Normalize every variant to the session-TZ TimestampType
    * the downstream operators expect:
    *   - LongType (nanos-as-long): truncate to µs — what DuckDB does when
    *     coercing to its µs TIMESTAMP, so oracle instants match exactly;
    *   - TimestampNTZType: cast to TimestampType — the session TZ is pinned
    *     UTC, so the wall-clock reinterpretation is the identity on the
    *     underlying µs value and hashes are unaffected;
    *   - TimestampType: already canonical (derived dirs from SfScale).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    normalizeTimestamp(raw, "ts")
  }

  /** Defensive timestamp normalization for any loader: longs are treated as
    * epoch nanos, NTZ is reinterpreted in the (pinned-UTC) session zone. */
  def normalizeTimestamp(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, expr(s"timestamp_micros($colName DIV 1000)"))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }
  }

  def documents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")

  def orders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")

  def customer(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")

  def part(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")

  def supplier(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "supplier")

  def nation(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "nation")

  def region(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "region")
}
