package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot grouping/join keys.
  *
  * At 100 TB a single hot key (one user, one hour bucket, one stop-shingle)
  * can pin an entire shuffle partition to one task. Two standard remedies,
  * both deterministic:
  *
  *  - [[saltedAgg]]: two-phase aggregation — shard each group across
  *    `salts` partial groups with a deterministic per-row salt, aggregate
  *    the shards in parallel, then combine shards per key. Works for any
  *    algebraic aggregate (sum/count/min/max) since they re-combine.
  *  - [[saltedBroadcastJoin]]: replicate the (small) build side `salts`
  *    times so the probe side's hot key spreads over `salts` tasks.
  *
  * AQE's `skewJoin` handles sort-merge join skew automatically at runtime;
  * these helpers cover the aggregation and broadcast cases it doesn't.
  */
object Skew {

  /** Deterministic salt in [0, salts): hashes stable row-identifying
    * columns (NOT rand() — reruns and retries must agree).
    */
  def saltCol(salts: Int, idCols: Seq[Column]): Column =
    pmod(hash(idCols: _*), lit(salts))

  /** Two-phase salted aggregation: `aggs` maps an output column name to a
    * (partial, combine) pair — e.g. `"n" -> (count(lit(1)), sum)` — so the
    * hot key's work spreads across `salts` tasks in phase 1 and phase 2
    * only combines `salts` pre-aggregated rows per key.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      idCols: Seq[Column],
      salts: Int,
      aggs: Seq[(String, (Column, Column => Column))]): DataFrame = {
    val phase1 = df
      .withColumn("__salt", saltCol(salts, idCols))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2._1.as(aggs.head._1),
        aggs.tail.map { case (n, (partial, _)) => partial.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, (_, combine)) => combine(col(n)).as(n) }: _*)
  }

  /** Salted broadcast join for a hot probe key against a small build side:
    * the build side is replicated once per salt value, the probe side's
    * rows carry their deterministic salt, and the equi-join key becomes
    * (key, salt) — the hot key now lands on `salts` different partitions.
    */
  def saltedBroadcastJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      salts: Int,
      probeIdCols: Seq[Column]): DataFrame = {
    val salted = probe.withColumn("__salt", saltCol(salts, probeIdCols))
    val replicated = build
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted
      .join(broadcast(replicated), Seq(key, "__salt"))
      .drop("__salt")
  }
}
