package graft.sink

import org.scalatest.funsuite.AnyFunSuite

/** No-database half of the D5 idempotency contract: the generated
  * insert-ignore statement (the live replay proof is the DB-gated test in
  * [[PostgresIntegrationSpec]]).
  */
class UpsertSqlSpec extends AnyFunSuite {

  test("insertIgnore generates ON CONFLICT DO NOTHING with one placeholder per column") {
    val sql = UpsertSql.insertIgnore(
      "ecommerce_events", Seq("event_id", "ts", "value"), Seq("event_id"))
    assert(sql ==
      "INSERT INTO ecommerce_events (event_id, ts, value) VALUES (?, ?, ?) " +
        "ON CONFLICT (event_id) DO NOTHING")
  }

  test("composite conflict keys render in order") {
    val sql = UpsertSql.insertIgnore("t", Seq("a", "b", "c"), Seq("a", "b"))
    assert(sql.endsWith("ON CONFLICT (a, b) DO NOTHING"))
  }

  test("illegal identifiers are rejected, not quoted around") {
    intercept[IllegalArgumentException](
      UpsertSql.insertIgnore("t; DROP TABLE x", Seq("a"), Seq("a")))
    intercept[IllegalArgumentException](
      UpsertSql.insertIgnore("t", Seq("a\"b"), Seq("a\"b")))
    intercept[IllegalArgumentException](
      UpsertSql.insertIgnore("t", Seq("a"), Seq("missing")))
    intercept[IllegalArgumentException](
      UpsertSql.insertIgnore("t", Seq.empty, Seq.empty))
  }
}
