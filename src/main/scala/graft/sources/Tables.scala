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

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright. Read nanos as raw longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
    * exactly what DuckDB does when it coerces to its µs-precision TIMESTAMP,
    * so oracle comparisons see identical instants.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // driver testdata: nanos-as-long → truncate; derived dirs (SfScale)
    // carry a real µs TIMESTAMP already — identical instants either way
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else raw
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
