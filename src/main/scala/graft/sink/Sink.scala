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
