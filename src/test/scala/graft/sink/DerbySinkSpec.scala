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

  test("postgres dialect stays the idempotent ON CONFLICT form") {
    // the Derby smoke must not weaken the production statement
    assert(UpsertSql.insertIgnore("t", Seq("a", "b"), Seq("a"))
      .endsWith("ON CONFLICT (a) DO NOTHING"))
    assert(UpsertSql.plainInsert("t", Seq("a", "b"), Seq("a")) ===
      "INSERT INTO t (a, b) VALUES (?, ?)")
  }
}
