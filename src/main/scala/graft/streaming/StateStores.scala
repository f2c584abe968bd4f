package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the stateful streaming ops (D1/D2
  * dedup, stream-stream interval joins, windowed aggregations, DocIngest).
  *
  * The default HDFS-backed store holds every key in executor heap — fine
  * for bounded watermark state, but a 100-TB streaming backfill with
  * hundreds of millions of live keys needs state that spills: RocksDB
  * keeps the working set off-heap with incremental (changelog)
  * checkpoints, bounding both heap and per-batch checkpoint upload. The
  * provider is a session-level conf read at query START, so it applies to
  * new queries without code changes in the ops themselves — the spec
  * proves dedup state written under RocksDB survives a checkpoint restart.
  */
object StateStores {
  val ProviderConfKey = "spark.sql.streaming.stateStore.providerClass"
  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Every conf key [[useRocksDB]]/[[useDefault]] touch — callers that
    * save/restore session state (specs on a shared session) must cover
    * all of them, not just the provider.
    */
  val managedConfKeys: Seq[String] = Seq(ProviderConfKey, ChangelogKey)

  /** Route new streaming queries' state through RocksDB. Changelog
    * checkpointing (default on) uploads per-batch deltas instead of full
    * SST snapshots — the difference between O(state) and O(changed-keys)
    * per-batch checkpoint cost.
    */
  def useRocksDB(spark: SparkSession, changelogCheckpoints: Boolean = true): Unit = {
    spark.conf.set(ProviderConfKey, RocksDBProvider)
    spark.conf.set(ChangelogKey, changelogCheckpoints.toString)
  }

  /** Back to the default (HDFS-backed, heap) provider. */
  def useDefault(spark: SparkSession): Unit = {
    spark.conf.unset(ProviderConfKey)
    spark.conf.unset(ChangelogKey)
  }
}
