package graft.sink

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.DatabaseConfig

/** LIVE execution of [[JdbcUpsertSink]]'s executor-side statement-batching
  * loop against embedded Derby (which ships in Spark's jar directory) —
  * the CI stand-in for the Postgres path that can only cancel in this
  * sandbox. ON CONFLICT is postgres syntax, so the dialect here is the
  * plain ANSI insert ([[UpsertSql.plainInsert]]); what this spec proves
  * live is everything AROUND the SQL string: per-partition connections,
  * prepared-statement batching (batchSize forces multiple executeBatch
  * round-trips per partition), the per-partition transaction, and the
  * rollback-on-failure atomicity a replayed batch relies on.
  */
class DerbySinkSpec extends SparkSpec {
  private val url = "jdbc:derby:memory:graftSmoke;create=true"
  private val cfg = DatabaseConfig(batchSize = 7, urlOverride = Some(url))
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  // same identity as the sink's connections: Derby maps the user to the
  // default schema (SPARK_USER), so DDL and the executor loop must agree
  private def withConn[A](f: java.sql.Connection => A): A = {
    Class.forName(driver)
    val c = DriverManager.getConnection(url, cfg.user, cfg.password)
    try f(c) finally c.close()
  }

  private def count(table: String): Long = withConn { c =>
    val rs = c.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
    rs.next(); rs.getLong(1)
  }

  test("statement-batching loop runs live: multi-partition append lands " +
    "every row through batched prepared statements") {
    withConn(_.createStatement().execute(
      "CREATE TABLE smoke_events (event_id BIGINT PRIMARY KEY, " +
        "event_type VARCHAR(20), value DOUBLE)"))
    val df = spark.range(0, 100)
      .select(col("id").as("event_id"),
        concat(lit("t"), pmod(col("id"), lit(5))).as("event_type"),
        (col("id") * 1.5).as("value"))
      .repartition(4) // 4 partitions × batchSize 7 → ≥4 executeBatch each
    val sink = new JdbcUpsertSink(cfg, Seq("event_id"), driver,
      UpsertSql.plainInsert)
    sink.append(df, "smoke_events")
    assert(count("smoke_events") === 100L)
  }

  test("per-partition transaction is atomic: a replayed batch fails on " +
    "the PK and rolls back without half-applying any partition") {
    withConn(_.createStatement().execute(
      "CREATE TABLE smoke_replay (event_id BIGINT PRIMARY KEY, " +
        "payload VARCHAR(20))"))
    // ONE partition: with several, Spark cancels sibling tasks when the
    // first fails, and an interrupted task's in-flight rollback can still
    // hold row locks when the assertion queries — a harness race, not a
    // sink property (the multi-partition path is covered above)
    val df = spark.range(0, 40)
      .select(col("id").as("event_id"), lit("x").as("payload"))
      .repartition(1)
    val sink = new JdbcUpsertSink(cfg, Seq("event_id"), driver,
      UpsertSql.plainInsert)
    sink.append(df, "smoke_replay")
    assert(count("smoke_replay") === 40L)
    // replay the identical batch: every partition holds only duplicate
    // keys, so each fails at executeBatch BEFORE its commit — counts must
    // be exactly 40 afterwards (a non-transactional loop would leave
    // partial batches behind)
    intercept[Exception] { sink.append(df, "smoke_replay") }
    assert(count("smoke_replay") === 40L)
  }

  test("plain JDBC append (S3/S4 df.write.jdbc path) runs live: table " +
    "auto-created, rows land, second append accumulates") {
    val jcfg = DatabaseConfig(batchSize = 7, urlOverride = Some(url),
      driverOverride = Some(driver))
    val sink = new JdbcSink(jcfg)
    val df = spark.range(0, 50)
      .select(col("id").as("event_id"),
        concat(lit("t"), pmod(col("id"), lit(3))).as("event_type"),
        (col("id") * 2.0).as("value"))
    sink.append(df, "plain_smoke")
    // Spark issues unquoted DDL, so Derby folds the name to upper case
    assert(count("plain_smoke") === 50L)
    sink.append(df, "plain_smoke") // plain append has no conflict handling
    assert(count("plain_smoke") === 100L)
  }

  test("JDBC probe (S2) runs live: subquery pushdown succeeds on a real " +
    "connection and returns the failure on a dead one") {
    val jcfg = DatabaseConfig(urlOverride = Some(url),
      driverOverride = Some(driver))
    // Derby's scalar SELECT needs a FROM clause — the overridable probe
    // relation exists exactly for this dialect delta
    val derbyProbe = "(SELECT 1 AS test FROM SYSIBM.SYSDUMMY1) AS test_query"
    assert(new JdbcSink(jcfg).probe(spark, derbyProbe).isSuccess)
    val dead = DatabaseConfig(
      urlOverride = Some("jdbc:derby:memory:graftNoSuchDb"), // no ;create=true
      driverOverride = Some(driver))
    assert(new JdbcSink(dead).probe(spark, derbyProbe).isFailure)
  }

  test("exactly-once end-to-end (S6+D5 composed): crash AFTER the sink " +
    "write but BEFORE the epoch commit; the restart replays the batch and " +
    "the PK upsert absorbs it — table equals the uninterrupted run's") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, lit}
    withConn(_.createStatement().execute(
      "CREATE TABLE eo_events (event_id BIGINT PRIMARY KEY, " +
        "payload VARCHAR(20))"))
    val sink = new JdbcUpsertSink(cfg, Seq("event_id"), driver,
      UpsertSql.plainInsert, rowLevelIgnore = true)
    val mem = MemoryStream[Long]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-eo").toString
    val seen = scala.collection.concurrent.TrieMap[Long, Int]()
    @volatile var crashArmed = true
    def startQuery() = mem.toDF()
      .select(col("value").as("event_id"), lit("p").as("payload"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.append(b, "eo_events")
        seen(id) = seen.getOrElse(id, 0) + 1
        // the dangerous window: rows are IN Derby, the offset commit is
        // not — a real crash here is exactly what at-least-once replays
        if (id == 1L && crashArmed) {
          crashArmed = false
          sys.error("injected crash after sink write, before epoch commit")
        }
      }
      .start()

    val q1 = startQuery()
    mem.addData(1L to 20L: _*)
    q1.processAllAvailable() // batch 0 commits cleanly
    mem.addData(21L to 40L: _*)
    intercept[Exception] { // batch 1 writes to Derby, then dies
      q1.processAllAvailable(); q1.awaitTermination()
    }
    assert(!q1.isActive)
    assert(count("eo_events") === 40L) // the write DID land pre-crash

    val q2 = startQuery() // same checkpoint: batch 1 must replay
    try {
      mem.addData(41L to 60L: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(seen(1L) >= 2, "batch 1 was not replayed — the spec did not " +
      "exercise the at-least-once window")
    // exactly-once at the table: every replayed row conflicted away
    assert(count("eo_events") === 60L)
    val sum = withConn { c =>
      val rs = c.createStatement()
        .executeQuery("SELECT SUM(event_id) FROM eo_events")
      rs.next(); rs.getLong(1)
    }
    assert(sum === (1L to 60L).sum)
  }

  test("postgres dialect stays the idempotent ON CONFLICT form") {
    // the Derby smoke must not weaken the production statement
    assert(UpsertSql.insertIgnore("t", Seq("a", "b"), Seq("a"))
      .endsWith("ON CONFLICT (a) DO NOTHING"))
    assert(UpsertSql.plainInsert("t", Seq("a", "b"), Seq("a")) ===
      "INSERT INTO t (a, b) VALUES (?, ?)")
  }
}
