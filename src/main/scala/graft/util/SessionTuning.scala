package graft.util

import org.apache.spark.sql.SparkSession

/** Session tuning shared by the measurement mains (Bench / Verify /
  * Explain / OptProf) — r18 optimization round.
  *
  * `spark.sql.adaptive.coalescePartitions.minPartitionSize` (Spark
  * default 1 MB) is AQE's floor on coalesced-partition size. With
  * `parallelismFirst` (default true) a post-shuffle stage gets
  * `max(totalBytes / defaultParallelism, minPartitionSize)`-sized
  * partitions — so any stage whose total shuffle bytes are under
  * `cores × 1 MB` is coalesced BELOW the session's parallelism purely on
  * byte count. That heuristic assumes compute ∝ bytes, which this
  * library's hot operators break by orders of magnitude: a 64-dim
  * quantized-dot candidate row is ~30 bytes but ~64 multiplies, a
  * posting-pair row is ~24 bytes into a hash aggregate. Measured (r18,
  * sf0.1, local[32]): q36's serving join — 3.8 MB of shuffle — ran in 3
  * AQE-coalesced tasks for 2.5 s where 32 tasks take ~0.4 s; q102's pair
  * aggregation (1.8 MB) ran single-task for 1.8 s.
  *
  * Lowering the floor to 16 KB restores the parallelism-first intent for
  * compute-dense small-byte stages while changing NOTHING at scale: once
  * `totalBytes / defaultParallelism` exceeds 16 KB (i.e. any shuffle past
  * ~0.5 MB/core — every real-data stage at 100 TB), the floor is inert
  * and AQE's byte-based coalescing behaves exactly as before. The resolved
  * default stays env-overridable so a deployment with genuinely
  * byte-proportional work can restore the 1 MB floor without a rebuild.
  */
object SessionTuning {
  val MinCoalescedPartitionSize: String =
    sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "16k")

  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      MinCoalescedPartitionSize)
}
