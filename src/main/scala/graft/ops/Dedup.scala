package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * The reference deduplicates a stream by key within a watermark
  * (`dropDuplicates(["event_id"])`,
  * `/root/reference/spark/spark_streaming_to_postgres.py:324-329`) — that
  * streaming form lives in [[graft.streaming.Pipeline]]. The batch forms
  * here are deterministic (explicit tie-break ordering) so they are
  * oracle-checkable, per SURVEY.md §7.
  *
  * Scale notes: `row_number` over `Window.partitionBy(keys)` is a single
  * hash shuffle on the dedup key — the same shuffle `dropDuplicates` would
  * do, but with a defined winner. Exact text dedup groups by a 128-bit hash
  * of the text rather than the text itself, so the shuffle carries 16-byte
  * keys instead of multi-KB documents.
  */
object Dedup {

  /** Keep exactly one row per key, deterministically: the first under
    * `orderBy` (ascending, nulls last via the extra tiebreak columns).
    */
  def deterministic(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate-document groups: md5(text) → group size + the kept
    * (minimum) doc_id. Only the hash shuffles, not the text.
    */
  def exactTextGroups(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count("*").as("n_copies"), min("doc_id").as("keeper_doc_id"))
      .orderBy("keeper_doc_id")

  /** Exact dedup of documents by content: keeps the lowest doc_id per
    * distinct text.
    */
  def exactTextDedup(documents: DataFrame): DataFrame =
    deterministic(
      documents.withColumn("text_hash", md5(col("text"))),
      Seq("text_hash"),
      Seq(col("doc_id")))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** STREAMING content dedup for document ingest: first-arrival wins per
    * md5(text) under an event-time watermark — the D2 pattern applied to
    * the training-data domain (continuous crawl/ingest). State holds one
    * 16-byte hash per distinct document inside the watermark horizon and
    * expires with it (`dropDuplicatesWithinWatermark`), so state is
    * bounded by ingest rate × watermark, not corpus size. Works on batch
    * frames too, where "first arrival" is made deterministic: the survivor
    * per hash is the row with the smallest (`tsCol`, `idCol`) — a streaming
    * engine sees arrival order, a batch engine must tie-break explicitly or
    * the kept metadata row differs across runs/engines.
    *
    * CHECKPOINT COMPATIBILITY: the dedup state key changed (r10) from the
    * 32-char md5 hex string to the 16-byte `unhex(md5(...))` binary. The
    * key's data type is part of `dropDuplicatesWithinWatermark`'s
    * state-store schema, so a streaming query restarted from a checkpoint
    * written by a hex-key build fails state-schema validation. Upgrading a
    * deployed stream requires a FRESH `checkpointLocation`; pair it with
    * an idempotent sink (D5 upsert) so the replayed watermark window
    * cannot double-write.
    */
  def streamingContentDedup(
      documents: DataFrame, tsCol: String = "ingest_ts",
      watermark: String = "10 minutes", idCol: String = "doc_id"): DataFrame = {
    // null-text rows (failed extraction etc.) PASS THROUGH un-deduped:
    // md5(null) is null and dropDuplicates treats null keys as equal, so
    // without the split every null-text row after the first would be
    // silently discarded as a "duplicate".
    val withText = documents.filter(col("text").isNotNull)
    val nullText = documents.filter(col("text").isNull)
    // 16-byte binary key, not the 32-char hex string: the hash is state
    // (every live watermark row carries it) and shuffle key — half the
    // bytes for identical dedup semantics (r10; it never leaves the plan)
    val hashed = withText.withColumn("text_hash", unhex(md5(col("text"))))
    val deduped =
      if (documents.isStreaming)
        hashed.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("text_hash")
      else deterministic(hashed, Seq("text_hash"), Seq(col(tsCol), col(idCol)))
    deduped.drop("text_hash").unionByName(nullText)
  }
}
