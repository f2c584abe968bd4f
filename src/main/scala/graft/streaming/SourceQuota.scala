package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-source ingest quota — the streaming twin of the batch
  * source-frequency cap (q53), built on `transformWithState` (Spark 4's
  * arbitrary-state operator, the successor to mapGroupsWithState):
  * every source may admit at most `quota` documents; the per-source
  * admission counter lives in a `ValueState` with a TTL, so a source's
  * budget refills `ttl` after it was last updated — a rolling crawl-flood
  * gate rather than an all-time cap.
  *
  * Why transformWithState over mapGroupsWithState here:
  *  - typed per-key state primitives with BUILT-IN TTL (no hand-rolled
  *    timeout bookkeeping in the state value),
  *  - state schema can evolve independently of the output type,
  *  - requires (and therefore exercises) the RocksDB state store
  *    provider — the configuration [[StateStores.useRocksDB]] plumbs.
  *
  * Scale shape: one hash shuffle on `source`, state one counter per live
  * source (bounded by distinct sources, not documents), RocksDB keeps it
  * off-heap. Emits every decision (admitted or rejected, with the running
  * count) so the caller can route rejects to a dead-letter/backpressure
  * path instead of silently dropping.
  */
object SourceQuota {

  final case class QuotaDecision(
      doc_id: Long, source: String, n_admitted: Long, admitted: Boolean)

  /** One counter per source with TTL; admits until `quota` is reached. */
  class SourceQuotaProcessor(quota: Long, ttl: java.time.Duration)
      extends StatefulProcessor[String, (String, Long), QuotaDecision] {
    @transient private var admitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long](
        "admitted", Encoders.scalaLong, TTLConfig(ttl))

    override def handleInputRows(
        source: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[QuotaDecision] = {
      // The decisions must materialize while the state handle is bound to
      // THIS key (a lazily-consumed iterator would touch state after the
      // operator rebinds to the next key), so the per-(key, batch) output
      // buffers here: one 4-field decision per input row, bounded by the
      // hottest source's share of a micro-batch — the admission-control
      // knob for that is the trigger size (maxFilesPerTrigger), not this
      // operator. State writes: ONE RocksDB put per key per batch (below),
      // not one per row.
      var n = if (admitted.exists()) admitted.get() else 0L
      val n0 = n
      val out = rows.map { case (_, docId) =>
        val admit = n < quota
        if (admit) n += 1
        QuotaDecision(docId, source, n, admit)
      }.toSeq // eager: state context + the single update happen now
      if (n != n0) admitted.update(n)
      out.iterator
    }
  }

  /** Apply the quota to a (streaming or batch) documents relation with
    * `source` and `doc_id` columns. Processing-time mode: the TTL clock is
    * ingest time, which is what a flood gate wants.
    */
  def sourceQuota(
      documents: DataFrame, quota: Long = 100L,
      ttl: java.time.Duration = java.time.Duration.ofHours(1)): Dataset[QuotaDecision] = {
    import documents.sparkSession.implicits._
    documents
      .select(col("source").as[String], col("doc_id").as[Long])
      .groupByKey(_._1)
      .transformWithState(
        new SourceQuotaProcessor(quota, ttl),
        TimeMode.ProcessingTime(),
        OutputMode.Append(),
        Encoders.product[QuotaDecision])
  }
}
