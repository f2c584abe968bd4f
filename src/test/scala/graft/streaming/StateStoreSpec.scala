package graft.streaming

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Pins the RocksDB state-store option: the provider actually engages
  * (rocksdb custom metrics on the stateful operator) and dedup state
  * written under it survives a checkpoint restart — the two properties
  * the 100-TB streaming-state story rests on.
  */
class StateStoreSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup state survives restart under the RocksDB state store") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val savedConfs = StateStores.managedConfKeys.map(k => k -> spark.conf.getOption(k))
    StateStores.useRocksDB(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("rocksdb-ckpt").toString
    // memory sink does not support checkpoint recovery — use a file sink
    val outDir = java.nio.file.Files.createTempDirectory("rocksdb-out").toString
    try {
      val mem = MemoryStream[(Long, String)]
      def start() = mem.toDF().toDF("event_id", "payload")
        .dropDuplicates("event_id")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt).start()

      val q1 = start()
      try {
        mem.addData((1L, "a"), (2L, "b"), (1L, "dup-in-batch"))
        q1.processAllAvailable()
        // the provider is live, not just configured: the stateful operator
        // reports rocksdb-prefixed custom metrics
        val custom = q1.lastProgress.stateOperators.head.customMetrics.keySet.asScala
        assert(custom.exists(_.toLowerCase.contains("rocksdb")), custom.mkString(", "))
        assert(spark.read.parquet(outDir).count() == 2)
        // changelog checkpointing is ON (useRocksDB's default): the store
        // must upload per-batch .changelog deltas, not only full snapshots
        // — the O(changed-keys) incremental story, asserted on disk
        val changelogs = java.nio.file.Files
          .walk(java.nio.file.Paths.get(ckpt, "state"))
          .iterator().asScala
          .count(_.toString.endsWith(".changelog"))
        assert(changelogs > 0, s"no .changelog files under $ckpt/state")
      } finally q1.stop()

      // restart from the same checkpoint: event 2 must still be in state
      val q2 = start()
      try {
        mem.addData((2L, "dup-across-restart"), (3L, "c"))
        q2.processAllAvailable()
        val out = spark.read.parquet(outDir).select("event_id").as[Long].collect()
        assert(out.toSeq.sorted == Seq(1L, 2L, 3L), s"state lost across restart: ${out.toSeq.sorted}")
      } finally q2.stop()
    } finally {
      // restore EVERY conf useRocksDB touched (provider + changelog), or
      // later suites on the shared session inherit leaked settings
      savedConfs.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
