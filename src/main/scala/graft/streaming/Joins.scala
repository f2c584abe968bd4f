package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM joins — the remaining streaming join family next to the
  * stream-static probe join ([[graft.ops.Similarity.streamingBucketProbe]]).
  *
  * The canonical shape is the watermarked interval join: two unbounded
  * inputs, an equality key plus an event-time range predicate. Spark keeps
  * BOTH sides in keyed state and the time bounds let it evict: a view can
  * only match purchases within `horizon` after it, so once the purchase
  * watermark passes `view_ts + horizon` the buffered view is dropped (and
  * symmetrically for purchases). Without the range condition state grows
  * forever — the time bound IS the scale design.
  *
  * Reference anchor: the reference computes view→purchase attribution only
  * as a batch view over Postgres; this is the same semantics kept inside
  * the engine with bounded state (its batch twin is q49's as-of
  * attribution).
  */
object Joins {

  /** Purchase attribution as a stream-stream inner interval join: each
    * purchase pairs with every view by the same user in the preceding
    * `horizonMinutes`. Both inputs carry `watermark` so the join state on
    * either side is evictable.
    *
    * Input schemas: events-shaped frames (`event_id, ts, user_id,
    * event_type, value, props`); the op filters each side itself so one
    * raw stream can feed both (`attribution(s, s)`).
    */
  def attribution(
      views: DataFrame, purchases: DataFrame,
      horizonMinutes: Int = 30, watermark: String = "1 hour"): DataFrame =
    attributionJoin(views, purchases, horizonMinutes, watermark, "inner")
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        col("view_ts"), col("purchase_ts"), col("purchase_value"))

  /** LEFT OUTER variant: views that never converted inside the horizon are
    * ALSO emitted (null purchase columns) — but only once the purchase-side
    * watermark has passed `view_ts + horizon`, i.e. once the engine can
    * PROVE no matching purchase can still arrive. That proof requirement is
    * why streaming outer joins demand both the watermark and the time-range
    * condition; the unmatched row's emission time is the eviction time of
    * the very state the inner join would have silently dropped.
    */
  def attributionOuter(
      views: DataFrame, purchases: DataFrame,
      horizonMinutes: Int = 30, watermark: String = "1 hour"): DataFrame =
    attributionJoin(views, purchases, horizonMinutes, watermark, "left_outer")
      .select(col("purchase_id"), col("view_id"), col("v_user").as("user_id"),
        col("view_ts"), col("purchase_ts"), col("purchase_value"))

  private def attributionJoin(
      views: DataFrame, purchases: DataFrame,
      horizonMinutes: Int, watermark: String, joinType: String): DataFrame = {
    val v = views
      .filter(lower(trim(col("event_type"))) === "view" && col("user_id").isNotNull)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .filter(lower(trim(col("event_type"))) === "purchase" && col("user_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    v.join(p,
      col("v_user") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"),
      joinType)
  }

  /** Batch oracle for [[attribution]] (watermarks are no-ops in batch, so
    * the SAME function is checked): all (view, purchase) pairs per user
    * within the horizon. In batch Spark plans this as an equi-join on
    * user_id with the range predicate as a post-join filter.
    */
  def attributionSql(horizonMinutes: Int = 30): String =
    s"""SELECT p.event_id AS purchase_id, v.event_id AS view_id,
       |  p.user_id AS user_id, v.ts AS view_ts, p.ts AS purchase_ts,
       |  p.value AS purchase_value
       |FROM events v JOIN events p
       |  ON v.user_id = p.user_id
       |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL $horizonMinutes MINUTE
       |WHERE lower(trim(v.event_type)) = 'view'
       |  AND lower(trim(p.event_type)) = 'purchase'
       |  AND v.user_id IS NOT NULL AND p.user_id IS NOT NULL
       |ORDER BY purchase_id, view_id""".stripMargin

  /** Batch oracle for [[attributionOuter]]. */
  def attributionOuterSql(horizonMinutes: Int = 30): String =
    s"""SELECT p.event_id AS purchase_id, v.event_id AS view_id,
       |  v.user_id AS user_id, v.ts AS view_ts, p.ts AS purchase_ts,
       |  p.value AS purchase_value
       |FROM (SELECT * FROM events
       |      WHERE lower(trim(event_type)) = 'view' AND user_id IS NOT NULL) v
       |LEFT JOIN (SELECT * FROM events
       |      WHERE lower(trim(event_type)) = 'purchase' AND user_id IS NOT NULL) p
       |  ON v.user_id = p.user_id
       |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL $horizonMinutes MINUTE
       |ORDER BY view_id, purchase_id""".stripMargin
}
