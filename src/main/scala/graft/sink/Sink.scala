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
    * instead of exiting so callers decide the policy. The probe relation is
    * overridable for dialects whose scalar SELECT needs a FROM clause
    * (Derby: `SYSIBM.SYSDUMMY1`).
    */
  def probe(
      spark: org.apache.spark.sql.SparkSession,
      testQuery: String = "(SELECT 1 AS test) AS test_query"): scala.util.Try[Unit] =
    scala.util.Try {
      spark.read.jdbc(config.jdbcUrl, testQuery, props)
        .collect()
      ()
    }
}

/** SQL generation for the idempotent append — pure and unit-testable
  * without a database. Identifiers are restricted to `[A-Za-z_][A-Za-z0-9_]*`
  * (they come from trusted schema code, but the guard makes the string
  * assembly injection-proof by construction).
  */
object UpsertSql {
  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r

  private def checked(name: String): String = {
    require(Ident.matches(name), s"illegal SQL identifier: '$name'")
    name
  }

  /** `INSERT INTO t (c1, c2, ...) VALUES (?, ?, ...) ON CONFLICT (k1, ...)
    * DO NOTHING` — PostgreSQL's insert-ignore (public syntax since 9.5).
    */
  def insertIgnore(table: String, cols: Seq[String], conflictCols: Seq[String]): String = {
    require(cols.nonEmpty, "no columns to insert")
    require(conflictCols.nonEmpty && conflictCols.forall(cols.contains),
      s"conflict columns $conflictCols must be a subset of the insert columns")
    s"INSERT INTO ${checked(table)} (${cols.map(checked).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${conflictCols.map(checked).mkString(", ")}) DO NOTHING"
  }

  /** Plain ANSI `INSERT INTO t (c1, ...) VALUES (?, ...)` — for backends
    * without an insert-ignore form (the Derby CI smoke). Idempotency then
    * rests on PK + the per-partition transaction: a replayed batch aborts
    * on the key violation and the rollback leaves the table untouched.
    */
  def plainInsert(table: String, cols: Seq[String], conflictCols: Seq[String]): String = {
    require(cols.nonEmpty, "no columns to insert")
    s"INSERT INTO ${checked(table)} (${cols.map(checked).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
  }
}

/** Idempotent JDBC sink — the exactly-once completion of the S6+D5 pair:
  * Structured Streaming's `foreachBatch` retries a failed epoch, so the
  * sink must absorb a REPLAYED batch; with the reference's primary key
  * (`docker/postgres/postgres_setup.sql:8`) a plain append dies on the PK
  * violation instead. This sink routes every row through
  * `INSERT ... ON CONFLICT (pk) DO NOTHING` with executor-side statement
  * batching (`batchSize` rows per round-trip, one transaction per
  * partition), making replays no-ops and preserving dual-layer dedup.
  *
  * Scale shape: connections/prepared statements are per PARTITION (the
  * `mapPartitions` discipline), rows never collect to the driver, and the
  * per-partition transaction keeps a retried task from half-applying — the
  * task's rows either commit once or conflict away on the retry.
  */
final class JdbcUpsertSink(
    config: DatabaseConfig, conflictCols: Seq[String] = Seq("event_id"),
    driverClass: String = "org.postgresql.Driver",
    insertSql: (String, Seq[String], Seq[String]) => String = UpsertSql.insertIgnore,
    rowLevelIgnore: Boolean = false)
  extends Sink with Serializable {

  override def append(df: DataFrame, table: String): Unit = {
    val cols = df.columns.toSeq
    val sql = insertSql(table, cols, conflictCols)
    val (url, user, password) = (config.jdbcUrl, config.user, config.password)
    val batchSize = config.batchSize
    val isolation = config.isolationLevel match {
      case "READ_UNCOMMITTED" => java.sql.Connection.TRANSACTION_READ_UNCOMMITTED
      case "REPEATABLE_READ" => java.sql.Connection.TRANSACTION_REPEATABLE_READ
      case "SERIALIZABLE" => java.sql.Connection.TRANSACTION_SERIALIZABLE
      case _ => java.sql.Connection.TRANSACTION_READ_COMMITTED
    }
    val width = cols.length
    val driver = driverClass
    val ignoreDups = rowLevelIgnore
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        Class.forName(driver)
        val conn = java.sql.DriverManager.getConnection(url, user, password)
        try {
          conn.setAutoCommit(false)
          conn.setTransactionIsolation(isolation)
          val ps = conn.prepareStatement(sql)
          try {
            if (ignoreDups) {
              // generic-dialect insert-ignore: engines without a native
              // ON CONFLICT form (the Derby smoke) reject a duplicate key
              // with standard SQLState 23505 and statement-level rollback,
              // so skipping that row and committing the rest reproduces
              // DO NOTHING semantics — one round-trip per row, the price
              // of the missing syntax; production (Postgres) keeps the
              // batched conflict-free path below
              rows.foreach { r =>
                var i = 0
                while (i < width) { ps.setObject(i + 1, r.get(i)); i += 1 }
                try { ps.executeUpdate(); () } catch {
                  case e: java.sql.SQLException if e.getSQLState == "23505" => ()
                }
              }
              conn.commit()
            } else {
            var pending = 0
            rows.foreach { r =>
              var i = 0
              while (i < width) { ps.setObject(i + 1, r.get(i)); i += 1 }
              ps.addBatch()
              pending += 1
              if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
            }
            if (pending > 0) ps.executeBatch()
            conn.commit()
            }
          } catch {
            // roll back EXPLICITLY before close: some engines (embedded
            // Derby — caught live by DerbySinkSpec) leave the failed
            // transaction's locks held when a connection is closed
            // mid-transaction, blocking the task retry that the rollback
            // exists to enable
            case t: Throwable =>
              try conn.rollback() catch { case _: Throwable => () }
              throw t
          } finally ps.close()
        } finally conn.close()
      }
    }
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

  /** The q101 WRITER — shuffled, sharded training files: assigns every
    * document its deterministic (shard, shard_pos) via
    * `Curate.trainingShards`' md5 permutation, then writes
    * `shard=N/part-*.parquet` with rows in shard_pos order INSIDE each
    * file. One shuffle (repartition by shard), one task-local sort, one
    * streamed file per (task, shard) — a training job reads shard dirs in
    * file order and gets the global pseudo-random permutation without any
    * engine ever running a global sort.
    */
  def writeShards(
      documents: DataFrame, path: String, nShards: Int = 16,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    import org.apache.spark.sql.functions.col
    val assigned = graft.ops.Curate
      .trainingShardsCore(documents, nShards)
      .select("doc_id", "shard", "shard_pos")
    documents.join(assigned, Seq("doc_id"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "shard_pos")
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(path)
  }
}

/** Test sink: collects rows per table on the driver. Not for production
  * scale (collect) — exists so streaming tests can assert on sink contents.
  */
final class InMemorySink extends Sink {
  val tables: mutable.Map[String, mutable.Buffer[Row]] = mutable.Map.empty
  override def append(df: DataFrame, table: String): Unit = {
    // collect (a Spark job) outside the lock: the streaming loops submit
    // independent sink appends concurrently (graft.util.ParJobs)
    val rows = df.collect()
    synchronized {
      tables.getOrElseUpdate(table, mutable.Buffer.empty) ++= rows
    }
  }
  def rowCount(table: String): Int = synchronized(tables.get(table).map(_.size).getOrElse(0))
}
