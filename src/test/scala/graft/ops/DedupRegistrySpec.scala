package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.Registry

class DedupRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("deterministic dedup keeps the first row under the tie-break order") {
    val df = Seq(
      (1L, "u1", ts("2024-01-10 10:00:02")),
      (2L, "u1", ts("2024-01-10 10:00:01")),
      (3L, "u2", ts("2024-01-10 10:00:03"))).toDF("event_id", "user_id", "ts")
    val got = Dedup.deterministic(df, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("event_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 3L)) // earliest ts wins for u1
  }

  test("deterministic dedup ties on ts break by event_id") {
    val df = Seq(
      (9L, "u1", ts("2024-01-10 10:00:00")),
      (4L, "u1", ts("2024-01-10 10:00:00"))).toDF("event_id", "user_id", "ts")
    val got = Dedup.deterministic(df, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("event_id").as[Long].collect()
    assert(got.toSeq == Seq(4L))
  }

  test("exact text dedup keeps lowest doc_id per identical text") {
    val df = Seq(
      (10L, "hello world", "en", "s", 11L),
      (3L, "hello world", "en", "s", 11L),
      (5L, "different", "en", "s", 9L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Dedup.exactTextDedup(df).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 5L))
    val groups = Dedup.exactTextGroups(df).collect()
    assert(groups.map(r => r.getAs[Long]("keeper_doc_id") -> r.getAs[Long]("n_copies")).toMap
      == Map(3L -> 2L, 5L -> 1L))
  }

  test("migrate v1→v2 adds nullable columns as nulls and stamps version") {
    val df = Seq((1L, ts("2024-01-10 10:00:00"), 7L, "view", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Registry.migrate(df, "v1", "v2")
    assert(out.columns.toSeq ==
      Registry.v2.fieldNames.toSeq :+ "schema_version")
    val row = out.collect()(0)
    assert(row.getAs[String]("schema_version") == "v2")
    assert(row.isNullAt(row.fieldIndex("session_id")))
    assert(row.isNullAt(row.fieldIndex("quantity")))
  }

  test("migrate same-version is a stable reorder + stamp") {
    val df = Seq((1L, ts("2024-01-10 10:00:00"), 7L, "view", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Registry.migrate(df, "v1", "v1")
    assert(out.count() == 1 && out.columns.last == "schema_version")
  }

  test("migrate unknown version throws") {
    val df = Seq((1L, "x")).toDF("event_id", "y")
    intercept[IllegalArgumentException](Registry.migrate(df, "v1", "v99"))
  }

  test("validateAgainstSchema reports missing required/optional and extra") {
    val df = Seq(("a", 1L)).toDF("event_type", "event_id")
    val rep = Registry.validateAgainstSchema(df, "v1")
    assert(!rep.isValid)
    assert(rep.missingRequired.toSet == Set("ts", "value"))
    assert(rep.missingOptional.toSet == Set("user_id", "props"))
    assert(rep.extra.isEmpty)
  }

  test("detectVersion prefers explicit schema_version column") {
    val df = Seq((1L, "v3")).toDF("event_id", "schema_version")
    assert(Registry.detectVersion(df).contains("v3"))
  }

  test("detectVersion falls back to highest fully-present version") {
    val v1df = Seq((1L, ts("2024-01-10 10:00:00"), 7L, "view", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(Registry.detectVersion(v1df).contains("v1"))
    val v2df = Registry.migrate(v1df, "v1", "v2").drop("schema_version")
    assert(Registry.detectVersion(v2df).contains("v2"))
  }

  test("migration composes: v1→v3 direct == v1→v2→v3 staged") {
    val v1df = Seq((1L, ts("2024-01-10 10:00:00"), 7L, "view", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val direct = Registry.migrate(v1df, "v1", "v3")
    val staged = Registry.migrate(
      Registry.migrate(v1df, "v1", "v2").drop("schema_version"), "v2", "v3")
    assert(direct.columns.toSeq == staged.columns.toSeq)
    assert(direct.collect().toSeq == staged.collect().toSeq)
  }

  test("autoMigrate lands on the current version") {
    val v1df = Seq((1L, ts("2024-01-10 10:00:00"), 7L, "view", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Registry.autoMigrate(v1df)
    assert(out.select("schema_version").distinct().as[String].collect().toSeq
      == Seq(Registry.currentVersion))
  }
}
