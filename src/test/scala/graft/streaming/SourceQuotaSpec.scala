package graft.streaming

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** transformWithState ingest quota: admits up to the quota per source,
  * counts persist across query RUNS (RocksDB-backed state recovered from
  * the checkpoint), rejects are emitted with the running count rather
  * than dropped.
  *
  * Trigger.Once on purpose: with the default zero-interval
  * processing-time trigger, transformWithState schedules continuous
  * empty maintenance micro-batches (state TTL eviction), which a
  * processAllAvailable-style test races forever — and even AvailableNow
  * keeps issuing maintenance batches instead of terminating (measured:
  * 101 batches for two drains). Trigger.Once runs exactly one
  * micro-batch and stops; deprecated for production (no rate limiting)
  * but exactly right for a deterministic two-run state-recovery test.
  */
class SourceQuotaSpec extends SparkSpec {
  import spark.implicits._

  test("per-source quota admits `quota` docs across runs, emits rejects") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val savedConfs = StateStores.managedConfKeys.map(k => k -> spark.conf.getOption(k))
    StateStores.useRocksDB(spark) // transformWithState requires RocksDB
    val ckpt = java.nio.file.Files.createTempDirectory("quota-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("quota-out").toString
    try {
      val mem = MemoryStream[(Long, String)]
      val stream = mem.toDF().toDF("doc_id", "source")
      @annotation.nowarn("cat=deprecation")
      def runOnce(): Unit = {
        val q = SourceQuota.sourceQuota(stream, quota = 3L)
          .toDF()
          .writeStream.outputMode("append").format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.Once())
          .start()
        q.awaitTermination(120000)
        q.stop()
      }
      mem.addData((1L, "a"), (2L, "a"), (3L, "b"))
      runOnce()
      // second run: source a exceeds its quota of 3, b stays under
      mem.addData((4L, "a"), (5L, "a"), (6L, "b"))
      runOnce()
      val rows = spark.read.parquet(outDir)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("source"), r.getAs[Long]("n_admitted"), r.getAs[Boolean]("admitted"))))
        .toMap
      assert(rows.size == 6, s"expected all 6 decisions, got $rows") // rejects included
      assert(rows(1L)._3 && rows(2L)._3 && rows(3L)._3)
      // exactly one of docs 4/5 is the third admit for source a (intra-batch
      // iterator order), the other is rejected at the quota
      val (a4, a5) = (rows(4L), rows(5L))
      assert(Seq(a4, a5).count(_._3) == 1, s"one admit expected: $a4 $a5")
      assert(Seq(a4, a5).count(r => !r._3 && r._2 == 3L) == 1)
      assert(rows(6L)._1 == "b" && rows(6L)._3) // b has budget left
    } finally {
      // restore EVERY conf useRocksDB touched (provider + changelog)
      savedConfs.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
