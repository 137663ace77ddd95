package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Inactivity (churn) detection through transformWithState EVENT-TIME
  * TIMERS — the half of the Spark 4 stateful API the profile processor
  * (StreamingUserStats) doesn't touch. A user who goes silent for
  * `gapMs` of EVENT time emits exactly one churn record, at the moment
  * the watermark passes their deadline — the pattern behind session
  * timeouts, SLA breach alerts, and abandoned-cart triggers.
  *
  * Why timers and not a windowed join: the "nothing happened" condition
  * has no row to join on — only a timer can turn absence into an event.
  * Each input row advances the user's last-seen and RE-ARMS the single
  * timer (delete + register — one timer per key, state is one
  * timestamp); when the watermark passes the armed deadline the engine
  * calls `handleExpiredTimer` and the key's state clears, so state is
  * bounded by the ACTIVE population (silent users leave the store the
  * moment they're flagged). Emission is append-mode by construction: a
  * churn record is final the instant it exists (the watermark proved no
  * earlier event can arrive).
  */
object StreamingInactivity {

  final case class Seen(user_id: Long, ts_ms: Long)

  /** One churn record per lapsed user: when they were last seen and the
    * event-time deadline that flagged them.
    */
  final case class Churned(user_id: Long, last_seen_ms: Long, deadline_ms: Long)

  final class InactivityProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Seen, Churned] {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")

    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long](
        "lastSeen", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Seen],
        timers: TimerValues): Iterator[Churned] = {
      var seen = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      rows.foreach(r => seen = math.max(seen, r.ts_ms))
      // Delete any armed timers UNCONDITIONALLY before re-arming: the
      // one-timer-per-key invariant must hold locally, not by relying on
      // handleExpiredTimer having cleared state alongside its timer.
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      lastSeen.update(seen)
      getHandle.registerTimer(seen + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Churned] = {
      val seen = lastSeen.get()
      lastSeen.clear() // flagged users leave the store: bounded state
      Iterator.single(Churned(key, seen, expired.getExpiryTimeInMs()))
    }
  }

  /** Flag users silent for `gapMs` of event time. The input must carry
    * a watermark (the caller applies `withWatermark` on its timestamp
    * column before converting to [[Seen]]) — without one, event-time
    * timers never fire.
    */
  def churnFlags(seen: Dataset[Seen], gapMs: Long): Dataset[Churned] = {
    import seen.sparkSession.implicits._
    seen.groupByKey(_.user_id)
      .transformWithState(new InactivityProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Output mode required by the sink for [[churnFlags]]. */
  val outputMode: OutputMode = OutputMode.Append()
}
