package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Multimodal
import graft.sink.Sink

/** The MEDIA branch of streaming ingest (VERDICT r11 #6 — [[DocIngest]]
  * is text-only, but a crawl yields mixed text+media): each micro-batch
  * of media rows (`media_id`, `kind`, `content` binary) flows through
  *
  *   1. the declared-kind gate — only `kind = "image"` rows enter the
  *      perceptual pipeline; other kinds pass through to the accepted
  *      sink unexamined (their dedup branches plug in beside this one —
  *      the video twin is [[graft.ops.Multimodal.videoNearDups]]'s
  *      frame-hash machinery);
  *   2. decode → dHash ([[Multimodal.hashImageBatch]] — one
  *      partition-local pass, payloads never shuffle); undecodable bytes
  *      route to the rejected sink as `decode_error` (the dead-letter
  *      pattern);
  *   3. the PERSISTED-signature gate
  *      ([[Multimodal.incrementalImageDedupAgainstIndex]] — exact-hash
  *      equi-join + hub-budgeted banded Hamming against the index, the
  *      image twin of the text crawl loop's verdicts): kept images
  *      append their signatures back so the NEXT batch sees them;
  *      duplicates land in the duplicate sink with their `dup_of`
  *      canonical.
  *
  * Scale shape per batch: decode cost is batch-linear and partition-
  * local; the index joins stream the two signature relations with
  * batch-sized shuffles only (never an index-sized exchange); the
  * write-back is a batch-sized parquet append. The index stores 16
  * bytes + 8 band rows per kept image — signatures, never pixels.
  *
  * Crash/replay: write-back-first ordering plus the verdict joins'
  * self-match exclusion make replays idempotent for routing, exactly as
  * [[CrawlDedup.processBatch]] documents for text.
  */
object MediaIngest {

  final case class MediaBatchMetrics(
      batchId: Long,
      nIn: Long,
      nImages: Long,
      nPassthrough: Long,
      nDecodeErr: Long,
      nExactDup: Long,
      nNearDup: Long,
      nAccepted: Long)

  /** Create an EMPTY persisted signature index at `path`. */
  def initIndex(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    Multimodal.writeImageSigIndex(
      Seq.empty[(Long, Long, Long)].toDF("media_id", "dhash_hi", "dhash_lo"),
      path)
  }

  /** Process one micro-batch (directly unit-testable): kind gate →
    * decode/hash → index verdicts → route → signature write-back.
    */
  def processBatch(
      batchDf: DataFrame,
      batchId: Long,
      indexPath: String,
      sink: Sink,
      timings: DocIngest.StageTimings = new DocIngest.StageTimings): MediaBatchMetrics = {
    val images = batchDf.filter(col("kind") === "image")
    val passthrough = batchDf.filter(col("kind") =!= "image")
    // decode+hash ONCE, pinned eagerly: hashes feed the verdict joins,
    // the routing joins and the index write-back — and the verdict pass
    // is a read-modify-write against the index (see the appendDedupIndex
    // recache note), so the rows must be immutable local blocks before
    // any append lands
    val hashed = timings.time("decode_hash")(
      Multimodal.hashImageBatch(images).localCheckpoint(true))
    try {
      // within-batch resolution first (the text loop's same-batch
      // contract, image edition): only in-batch canonicals face the
      // index; same-batch copies route with dup_of at their in-batch
      // canonical
      val intra = timings.time("intra_batch")(
        Multimodal.intraBatchImageDedup(hashed.filter(col("decoded"))))
      val canonHashes = hashed.filter(col("decoded")).join(
        intra.filter(col("status") === "kept").select("media_id"), "media_id")
      // dup_of resolved to the ROOT canonical (ADVICE r12 — see
      // CrawlDedup.processBatch): one-hop in-batch pointers re-pointed at
      // the doc nothing marks duplicate, statuses unchanged
      val verdicts = timings.time("verdicts")(
        try graft.ops.NearDup.resolveDupRoots(
          Multimodal.incrementalImageDedupAgainstIndex(canonHashes, indexPath)
            .unionByName(intra.filter(col("status") =!= "kept"))
            .localCheckpoint(true),
          idCol = "media_id", freeInput = true)
        finally intra.unpersist())
      try {
        val counts = verdicts.groupBy("status").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val nKept = counts.getOrElse("kept", 0L)
        val nExact = counts.getOrElse("exact_dup", 0L)
        val nNear = counts.getOrElse("near_dup", 0L)
        val nDecodeErr = hashed.filter(!col("decoded")).count()
        val nPass = passthrough.count()
        val keptHashes = hashed
          .join(verdicts.filter(col("status") === "kept").select("media_id"),
            "media_id")
        if (nKept > 0) {
          // write-back FIRST (idempotent for verdicts AND routing — the
          // self-match exclusion covers the replay window)
          timings.time("index_append")(
            Multimodal.appendImageSigIndex(keptHashes, indexPath))
          timings.time("accepted_append")(
            sink.append(batchDf.join(keptHashes.select("media_id"), "media_id"),
              "accepted_media"))
        }
        if (nPass > 0)
          timings.time("passthrough_append")(
            sink.append(passthrough, "accepted_media"))
        if (nExact + nNear > 0)
          timings.time("duplicate_append")(
            sink.append(verdicts.filter(col("status") =!= "kept"),
              "duplicate_media"))
        if (nDecodeErr > 0)
          timings.time("rejected_append")(
            sink.append(hashed.filter(!col("decoded"))
              .select(col("media_id"), lit("decode_error").as("reject_reason")),
              "rejected_media"))
        MediaBatchMetrics(batchId, nKept + nExact + nNear + nDecodeErr + nPass,
          nKept + nExact + nNear + nDecodeErr, nPass, nDecodeErr,
          nExact, nNear, nKept + nPass)
      } finally {
        verdicts.unpersist()
        ()
      }
    } finally {
      hashed.unpersist()
      ()
    }
  }

  /** Wire the full streaming query: foreachBatch(kind gate → hash →
    * verdicts → route → write-back), checkpointed. The index at
    * `indexPath` must exist ([[initIndex]] or a prior
    * [[Multimodal.writeImageSigIndex]] snapshot).
    */
  def start(
      spark: SparkSession,
      media: DataFrame,
      checkpointDir: String,
      indexPath: String,
      sink: Sink,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      timings: DocIngest.StageTimings = new DocIngest.StageTimings,
      metricsOut: MediaBatchMetrics => Unit = _ => ()): StreamingQuery = {
    val writer = media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // one source scan per batch (see CrawlDedup.start's pin note)
        val pinned = batch.localCheckpoint(true)
        try {
          if (!pinned.isEmpty)
            metricsOut(processBatch(pinned, id, indexPath, sink, timings))
        } finally { pinned.unpersist(); () }
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}
