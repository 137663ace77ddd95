package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: attribute each click to the views the
  * same user made in the preceding `horizon` — the canonical two-stream
  * event-time join (ad attribution, cause->effect pairing). This is the
  * one streaming join class the stream-static tier
  * ([[StreamingIncrementalDedup]]) cannot express: BOTH sides arrive
  * continuously and rows must wait for late partners.
  *
  * State contract (what makes this safe at 100 TB/day): stream-stream
  * joins buffer both sides keyed by user_id. The watermarks plus the
  * two-sided time-range condition give Spark a provable eviction bound —
  * a buffered view older than (watermark - horizon) can never match a
  * future click, so state is bounded by (event rate x (delay + horizon)),
  * never by stream history. Without the range condition the state grows
  * forever; the join would still be *correct*, which is what makes the
  * omission an insidious production hazard (called out here, asserted in
  * StreamingIntervalJoinSpec).
  *
  * Inner join => append-mode output; each (view, click) pair emits once,
  * when both sides have arrived.
  */
object StreamingIntervalJoin {

  /** `views`/`clicks` need (user_id, event_id, ts) columns; both sides
    * get a `delay` watermark. Output: one row per (view, click) pair
    * with click_ts in [view_ts, view_ts + horizon].
    */
  def attribute(views: DataFrame, clicks: DataFrame,
      horizon: String = "10 minutes", delay: String = "20 minutes"): DataFrame =
    joined(views, clicks, horizon, delay, "inner")

  /** LEFT OUTER variant: every view emits exactly once — paired rows as
    * soon as both sides arrive (inner semantics), and UNMATCHED views
    * with a null click once the watermark proves no qualifying click
    * can still arrive (watermark > view_ts + horizon). This is the
    * "did the ad convert AT ALL" report the inner join cannot produce,
    * and the semantics Spark only allows because the time-range
    * condition yields that proof — the null row is emitted on state
    * EVICTION, so a replay must advance the watermark past the last
    * view's bound (a flush sentinel) or tail views stay buffered and
    * unreported when the query stops.
    */
  def attributeLeftOuter(views: DataFrame, clicks: DataFrame,
      horizon: String = "10 minutes", delay: String = "20 minutes"): DataFrame =
    joined(views, clicks, horizon, delay, "leftOuter")

  private def joined(views: DataFrame, clicks: DataFrame,
      horizon: String, delay: String, joinType: String): DataFrame = {
    val v = views
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", delay)
    val c = clicks
      .select(col("user_id").as("click_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    v.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }
}
