package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Versioned schema registry with default-filling migration.
  *
  * Re-expresses the reference's `SchemaRegistry`
  * (`/root/reference/spark/schema/registry.py:44-321`): versioned
  * `StructType`s, `migrate` (add absent columns as typed default literals,
  * reorder via `select`, stamp `schema_version`), `validateAgainstSchema`
  * (missing/extra column diff), and `autoMigrate` (detect version from a
  * `schema_version` column or a required-columns heuristic, then migrate).
  *
  * Versions are adapted to the testdata `events` schema: v1 is the raw
  * table; v2 adds the reference's session/segment enrichment columns
  * (`registry.py:73-93`); v3 adds device/geo columns (`registry.py:96-117`).
  * Migration is pure logical-plan rewriting (`withColumn(lit)` + `select`)
  * — no data movement, executes lazily with the consuming action.
  */
object Registry {

  val v1: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = true)))

  val v2: StructType = StructType(v1.fields ++ Seq(
    StructField("session_id", StringType, nullable = true),
    StructField("category", StringType, nullable = true),
    StructField("quantity", IntegerType, nullable = true),
    StructField("user_segment", StringType, nullable = true),
    StructField("search_query", StringType, nullable = true),
    StructField("source_system", StringType, nullable = true)))

  val v3: StructType = StructType(v2.fields ++ Seq(
    StructField("device_type", StringType, nullable = true),
    StructField("browser", StringType, nullable = true),
    StructField("geo_country", StringType, nullable = true),
    StructField("geo_city", StringType, nullable = true),
    StructField("referrer", StringType, nullable = true),
    StructField("campaign_id", StringType, nullable = true)))

  val versions: Map[String, StructType] = Map("v1" -> v1, "v2" -> v2, "v3" -> v3)
  val currentVersion = "v2"

  def schemaFor(version: String): StructType =
    versions.getOrElse(version,
      throw new IllegalArgumentException(
        s"Unknown schema version '$version' (known: ${versions.keys.toSeq.sorted.mkString(", ")})"))

  /** Type-appropriate default for an added column
    * (`registry.py:233-247`): "" / 0 / 0.0 / false for non-nullable,
    * null otherwise — the reference's defaults keyed by type, with
    * string defaults mirroring its semantic names ("unknown" category etc.
    * are applied by [[graft.ops.Enrich]], not the registry).
    */
  def defaultFor(field: StructField): Column = {
    val c =
      if (field.nullable) lit(null)
      else field.dataType match {
        case StringType => lit("")
        case IntegerType | LongType => lit(0)
        case DoubleType | FloatType => lit(0.0)
        case BooleanType => lit(false)
        case TimestampType => lit("1970-01-01 00:00:00")
        case _ => lit(null)
      }
    c.cast(field.dataType)
  }

  /** R1 — migrate a DataFrame between registered versions: add missing
    * target fields as typed defaults, project to target column order, stamp
    * `schema_version` (`registry.py:190-231`).
    */
  def migrate(df: DataFrame, fromVersion: String, toVersion: String): DataFrame = {
    schemaFor(fromVersion) // validate both versions exist
    val target = schemaFor(toVersion)
    val present = df.columns.toSet
    val withDefaults = target.fields.foldLeft(df) { (acc, f) =>
      if (present.contains(f.name)) acc
      else acc.withColumn(f.name, defaultFor(f))
    }
    withDefaults
      .select(target.fieldNames.map(col).toSeq: _*)
      .withColumn("schema_version", lit(toVersion))
  }

  /** R3 — diff a DataFrame's columns against a version: (missing required,
    * missing optional, extra) (`registry.py:249-282`).
    */
  case class ValidationReport(
      missingRequired: Seq[String],
      missingOptional: Seq[String],
      extra: Seq[String]) {
    def isValid: Boolean = missingRequired.isEmpty
  }

  def validateAgainstSchema(df: DataFrame, version: String): ValidationReport = {
    val target = schemaFor(version)
    val present = df.columns.toSet
    val targetNames = target.fields.map(_.name).toSet
    ValidationReport(
      missingRequired =
        target.fields.filter(f => !f.nullable && !present.contains(f.name)).map(_.name).toSeq,
      missingOptional =
        target.fields.filter(f => f.nullable && !present.contains(f.name)).map(_.name).toSeq,
      extra = df.columns.filterNot(c => targetNames.contains(c) || c == "schema_version").toSeq)
  }

  /** R4 — detect the version of a DataFrame: explicit `schema_version`
    * column if present (first non-null value), else the highest version
    * whose field names are all present (`registry.py:284-321`).
    */
  def detectVersion(df: DataFrame): Option[String] = {
    if (df.columns.contains("schema_version")) {
      val head = df.select("schema_version")
        .filter(col("schema_version").isNotNull).limit(1).collect()
      if (head.nonEmpty) return Some(head(0).getString(0))
    }
    val present = df.columns.toSet
    versions.toSeq
      .filter { case (_, s) => s.fieldNames.forall(present.contains) }
      .sortBy(_._1).lastOption.map(_._1)
  }

  /** Detect + migrate to the current version. */
  def autoMigrate(df: DataFrame): DataFrame = {
    val from = detectVersion(df).getOrElse(
      throw new IllegalArgumentException(
        s"Cannot detect schema version for columns [${df.columns.mkString(", ")}]"))
    migrate(df.drop("schema_version"), from, currentVersion)
  }
}
