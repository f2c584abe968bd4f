package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) ingestion for the documents table — the
  * wire format most LLM corpora actually ship in (one JSON object per
  * line; Common Crawl derivatives, chat logs, synthetic-data dumps).
  *
  * Design mirrors the engine's CSV/validation path (P1–P3): a PINNED
  * schema (never `inferSchema` — schema inference is a full extra pass
  * over 100 TB and lets one malformed shard silently widen a column),
  * PERMISSIVE parsing with the raw line captured into a corrupt-record
  * column, and explicit routing — callers get the valid stream and the
  * dead-letter stream from one scan, same as `Validate.deadLetter`.
  *
  * Scale notes: JSON line parsing is per-row work with full predicate/
  * column pruning on the parsed fields (Spark's JacksonParser skips
  * unprojected fields); gzip-compressed `.jsonl.gz` shards read
  * transparently but are NOT splittable — at 100 TB, shard the corpus at
  * write time (many ≤1 GB files) rather than relying on splits, which is
  * how public corpora are distributed anyway.
  */
object JsonlSource {
  /** Raw-line capture column (Spark default name, pinned explicitly). */
  val CorruptCol = "_corrupt_record"

  /** documents-table schema + the corrupt capture column. n_chars is read
    * as LONG to match the parquet loaders' schema exactly.
    */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField(CorruptCol, StringType)))

  /** One scan, both streams downstream: parsed rows with the corrupt
    * column still attached. Spark refuses a query that reads ONLY the
    * corrupt column of a just-parsed relation (it would never be
    * populated under column pruning); routing through [[valid]] /
    * [[deadLetter]] always projects parsed fields alongside it, which is
    * the supported shape.
    */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Streaming twin (the S1 shape for corpora): a JSONL file stream with
    * the same pinned schema, corrupt capture and routing —
    * `maxFilesPerTrigger` bounds micro-batch size exactly like the CSV
    * event stream. [[valid]] / [[deadLetter]] are pure projections, so
    * they apply to this stream unchanged; the valid side feeds
    * [[graft.streaming.DocIngest]] after event-time stamping.
    */
  def readDocumentsStream(
      spark: SparkSession, path: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** Parsed documents that are structurally sound AND carry the required
    * fields (doc_id, text) — the JSONL analog of the P2 validity flag. A
    * line can parse as valid JSON yet miss required fields; both failure
    * classes route to the dead letter, not silently into the corpus.
    */
  def valid(parsed: DataFrame): DataFrame =
    parsed
      .filter(col(CorruptCol).isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .select("doc_id", "text", "lang", "source", "n_chars")

  /** Dead-letter stream: the raw line (for corrupt JSON) or the parsed
    * remains (for missing required fields), with a reason tag — same
    * contract as the events dead-letter sink (S4/P3).
    */
  def deadLetter(parsed: DataFrame): DataFrame =
    parsed
      .filter(col(CorruptCol).isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      .select(
        coalesce(col(CorruptCol),
          to_json(struct(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars")))).as("raw"),
        when(col(CorruptCol).isNotNull, "malformed_json")
          .when(col("doc_id").isNull, "missing_doc_id")
          .otherwise("missing_text").as("reason"))
}
