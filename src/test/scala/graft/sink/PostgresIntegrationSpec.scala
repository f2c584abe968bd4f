package graft.sink

import java.sql.{Connection, DriverManager}

import scala.util.Try

import org.scalatest.funsuite.AnyFunSuite

import graft.config.DatabaseConfig

/** DB-gated integration spec for the sink-side idempotency/constraint layer
  * (SURVEY.md §2 D5) — the behavior the reference checks live in
  * `/root/reference/tests/test_integration.py:169-275` (duplicate PK
  * rejected, CHECK-violating rows rejected) against
  * `docker/postgres/postgres_setup.sql`.
  *
  * Gating mirrors the reference's skip-when-unreachable fixture
  * (`test_integration.py:34-42`): every test `assume`s a reachable
  * Postgres, so without one the suite reports CANCELED (visible in the
  * run), never silently green. Configure via GRAFT_PG_HOST / GRAFT_PG_PORT
  * / GRAFT_PG_DB / GRAFT_PG_USER / GRAFT_PG_PASSWORD.
  *
  * Uses plain JDBC (not Spark) so the constraint round-trips are exact and
  * fast; the Spark write path itself is covered by the ParquetSink /
  * InMemorySink streaming specs — semantics at the DataFrame boundary are
  * identical by construction (same `Sink.append` contract).
  */
class PostgresIntegrationSpec extends AnyFunSuite {

  private val cfg = DatabaseConfig(
    host = sys.env.getOrElse("GRAFT_PG_HOST", "localhost"),
    port = sys.env.getOrElse("GRAFT_PG_PORT", "5432").toInt,
    database = sys.env.getOrElse("GRAFT_PG_DB", "ecommerce"),
    user = sys.env.getOrElse("GRAFT_PG_USER", "spark_user"),
    password = sys.env.getOrElse("GRAFT_PG_PASSWORD", "spark_password"))

  private def connect(): Option[Connection] =
    Try {
      Class.forName("org.postgresql.Driver")
      DriverManager.setLoginTimeout(3)
      DriverManager.getConnection(cfg.jdbcUrl, cfg.user, cfg.password)
    }.toOption

  private def withDb(testBody: Connection => Unit): Unit = {
    val conn = connect()
    assume(conn.isDefined, s"PostgreSQL not reachable at ${cfg.jdbcUrl} — skipping")
    try {
      applySetupDdl(conn.get)
      testBody(conn.get)
    } finally conn.get.close()
  }

  /** Applies sql/postgres_setup.sql (idempotent: IF NOT EXISTS / OR REPLACE). */
  private def applySetupDdl(conn: Connection): Unit = {
    val ddl = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("sql/postgres_setup.sql")),
      java.nio.charset.StandardCharsets.UTF_8)
    val st = conn.createStatement()
    try ddl.split(";").map(_.trim).filter(_.nonEmpty).foreach(st.execute)
    finally st.close()
  }

  private def insertEvent(conn: Connection, id: Long, eventType: String,
      userId: java.lang.Long, value: Double): Unit = {
    val ps = conn.prepareStatement(
      "INSERT INTO ecommerce_events (event_id, ts, user_id, event_type, value) VALUES (?, NOW(), ?, ?, ?)")
    try {
      ps.setLong(1, id)
      if (userId == null) ps.setNull(2, java.sql.Types.BIGINT) else ps.setLong(2, userId)
      ps.setString(3, eventType)
      ps.setDouble(4, value)
      ps.executeUpdate()
    } finally ps.close()
  }

  private def cleanup(conn: Connection, id: Long): Unit = {
    val st = conn.createStatement()
    try st.execute(s"DELETE FROM ecommerce_events WHERE event_id = $id") finally st.close()
  }

  test("duplicate event_id is rejected by the primary key (sink idempotency)") {
    withDb { conn =>
      val id = System.nanoTime()
      try {
        insertEvent(conn, id, "view", 1L, 1.0)
        val dup = Try(insertEvent(conn, id, "view", 1L, 1.0))
        assert(dup.isFailure, "second insert with same event_id must fail")
        assert(dup.failed.get.isInstanceOf[java.sql.SQLException])
      } finally cleanup(conn, id)
    }
  }

  test("invalid event_type is rejected by CHECK") {
    withDb { conn =>
      val id = System.nanoTime()
      try {
        val bad = Try(insertEvent(conn, id, "not_a_type", 1L, 1.0))
        assert(bad.isFailure, "unknown event_type must violate the CHECK constraint")
      } finally cleanup(conn, id)
    }
  }

  test("negative value is rejected by CHECK") {
    withDb { conn =>
      val id = System.nanoTime()
      try {
        val bad = Try(insertEvent(conn, id, "view", 1L, -1.0))
        assert(bad.isFailure, "negative value must violate the CHECK constraint")
      } finally cleanup(conn, id)
    }
  }

  test("login-required event without user_id is rejected (chk_user_required)") {
    withDb { conn =>
      val id = System.nanoTime()
      try {
        val bad = Try(insertEvent(conn, id, "purchase", null, 5.0))
        assert(bad.isFailure, "purchase without user_id must violate chk_user_required")
        // ...while an anonymous view passes:
        insertEvent(conn, id, "view", null, 1.0)
      } finally cleanup(conn, id)
    }
  }

  test("dead-letter insert requires validation_errors NOT NULL") {
    withDb { conn =>
      val st = conn.createStatement()
      try {
        val bad = Try(st.execute(
          "INSERT INTO dead_letter_events (event_id, event_type) VALUES (1, 'view')"))
        assert(bad.isFailure, "dead-letter rows must carry their error tag")
      } finally st.close()
    }
  }

  test("S2/S3: JdbcSink probe + Spark append round-trip (live DB)") {
    withDb { conn =>
      val spark = graft.SparkSpec.session
      import spark.implicits._
      val sink = new JdbcSink(cfg)
      assert(sink.probe(spark).isSuccess, "probe read of (SELECT 1) t must succeed")
      val id = System.nanoTime()
      try {
        val df = Seq((id, java.sql.Timestamp.valueOf("2024-01-10 10:00:00"),
            7L, "view", 5.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        sink.append(df, "ecommerce_events")
        // the per-batch metrics row, with the exact columns processBatch writes
        sink.append(
          Seq((id, 1L, 1L, 0L, 100.0, 0.01))
            .toDF("batch_id", "total_events", "valid_events", "invalid_events",
              "validity_rate", "processing_time_sec"),
          "data_quality_metrics")
        val st = conn.createStatement()
        val rs = st.executeQuery(s"SELECT event_type FROM ecommerce_events WHERE event_id = $id")
        assert(rs.next() && rs.getString(1) == "view")
        val rs2 = st.executeQuery(
          s"SELECT total_events FROM data_quality_metrics WHERE batch_id = $id")
        assert(rs2.next() && rs2.getLong(1) == 1L)
        st.execute(s"DELETE FROM data_quality_metrics WHERE batch_id = $id")
        st.close()
      } finally cleanup(conn, id)
    }
  }

  test("D5/S6: JdbcUpsertSink — a REPLAYED batch is a no-op (live DB)") {
    withDb { conn =>
      val spark = graft.SparkSpec.session
      import spark.implicits._
      val sink = new JdbcUpsertSink(cfg)
      val id = System.nanoTime()
      try {
        val df = Seq((id, java.sql.Timestamp.valueOf("2024-01-10 10:00:00"),
            7L, "view", 5.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        sink.append(df, "ecommerce_events")
        // the foreachBatch retry contract: the SAME batch arrives again —
        // a plain append dies on the PK; the upsert absorbs it
        sink.append(df, "ecommerce_events")
        // and a replayed batch that grew (retry after partial upstream
        // progress) inserts ONLY the new row
        val grown = df.union(
          Seq((id + 1, java.sql.Timestamp.valueOf("2024-01-10 10:00:01"),
            8L, "purchase", 6.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
        sink.append(grown, "ecommerce_events")
        val st = conn.createStatement()
        val rs = st.executeQuery(
          s"SELECT event_id, count(*) FROM ecommerce_events " +
            s"WHERE event_id IN ($id, ${id + 1}) GROUP BY 1 ORDER BY 1")
        assert(rs.next() && rs.getLong(1) == id && rs.getLong(2) == 1L)
        assert(rs.next() && rs.getLong(1) == id + 1 && rs.getLong(2) == 1L)
        assert(!rs.next())
        st.execute(s"DELETE FROM ecommerce_events WHERE event_id = ${id + 1}")
        st.close()
      } finally cleanup(conn, id)
    }
  }
}
