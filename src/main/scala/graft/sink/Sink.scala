package graft.sink

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SaveMode}

import graft.config.DatabaseConfig

/** Sink abstraction over the reference's three JDBC appends
  * (`/root/reference/spark/spark_streaming_to_postgres.py:388-473`): valid
  * events, dead-letter rows, and quality metrics all go through `append`,
  * each projected to a pinned column list before the write (sink-schema
  * pinning, reference `:346-358`).
  *
  * The JDBC implementation carries the reference's write options
  * (`batchsize`, `isolationLevel` — `:337-343`); the parquet and in-memory
  * implementations make the pipeline testable without a database, with
  * identical semantics at the DataFrame boundary.
  */
trait Sink {
  def append(df: DataFrame, table: String): Unit
}

/** Columns the engine writes per table (reference `EVENTS_TABLE_COLUMNS` /
  * `DEAD_LETTER_COLUMNS`, `spark_streaming_to_postgres.py:346-358`).
  */
object SinkColumns {
  val events: Seq[String] = Seq(
    "event_id", "ts", "user_id", "event_type", "value", "props",
    "quantity", "total_amount", "event_year", "event_month", "event_day",
    "event_hour", "event_dayofweek", "is_late_arrival", "session_id")
  val deadLetter: Seq[String] = Seq(
    "event_id", "ts", "user_id", "event_type", "value", "props",
    "validation_errors")
  def project(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = cols.filter(df.columns.contains)
    df.select(present.head, present.tail: _*)
  }
}

final class JdbcSink(config: DatabaseConfig) extends Sink {
  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    config.properties.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  override def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).jdbc(config.jdbcUrl, table, props)

  /** S2 — pre-flight connection probe: a subquery-pushdown read of
    * `(SELECT 1) t` forced with a collect, like the reference's startup
    * check (`spark_streaming_to_postgres.py:488-500`). Returns the failure
    * instead of exiting so callers decide the policy.
    */
  def probe(spark: org.apache.spark.sql.SparkSession): scala.util.Try[Unit] =
    scala.util.Try {
      spark.read.jdbc(config.jdbcUrl, "(SELECT 1 AS test) AS test_query", props)
        .collect()
      ()
    }
}

final class ParquetSink(baseDir: String) extends Sink {
  override def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(s"$baseDir/$table")
}

/** Dataset publisher: writes a curated corpus as hive-partitioned parquet
  * (e.g. `split=train/lang=en/part-*.parquet`) — the layout downstream
  * training jobs prune by directory instead of reading a manifest.
  *
  * Scale notes: `partitionBy` writes one file per (task, partition-value)
  * combination, so the frame is repartitioned by the partition columns
  * first — at most one shuffle — to avoid the small-files explosion
  * (32 tasks × P values → 32·P files without it, P files with it; skewed
  * partition values would instead repartition on (cols, salt)).
  * `maxRecordsPerFile` bounds the other extreme: one giant file per value.
  */
object DatasetWriter {
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}

/** Test sink: collects rows per table on the driver. Not for production
  * scale (collect) — exists so streaming tests can assert on sink contents.
  */
final class InMemorySink extends Sink {
  val tables: mutable.Map[String, mutable.Buffer[Row]] = mutable.Map.empty
  override def append(df: DataFrame, table: String): Unit = synchronized {
    tables.getOrElseUpdate(table, mutable.Buffer.empty) ++= df.collect()
  }
  def rowCount(table: String): Int = synchronized(tables.get(table).map(_.size).getOrElse(0))
}
