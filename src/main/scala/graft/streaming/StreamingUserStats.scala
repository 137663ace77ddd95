package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user running activity profile through Spark 4's
  * `transformWithState` — the arbitrary-stateful-processing API that
  * supersedes `mapGroupsWithState` (used by StreamingTermCounts /
  * StatefulSessions, kept there deliberately: both APIs belong to the
  * engine's surface). What the new API buys at 100 TB:
  *
  *   - **Typed state handles** (`ValueState`/`ListState`/`MapState`)
  *     instead of one opaque state blob — each handle is a separate
  *     column family in the store, updated independently.
  *   - **Native TTL** (`TTLConfig`) — idle keys evict from the store by
  *     themselves; with `GroupState` the operator must encode its own
  *     timeout dance. State for a user population that churns stays
  *     bounded by the ACTIVE population, the unbounded-state answer
  *     when no watermark applies (profiles have no event-time horizon).
  *   - **The RocksDB state store**: transformWithState requires the
  *     RocksDB provider, which spills keyed state to local SSD — per-
  *     executor state beyond heap, the store a billion-key profile
  *     table actually needs (the spec sets
  *     `spark.sql.streaming.stateStore.providerClass` accordingly).
  *
  * Semantics: exact per-user running (event count, cents total, purchase
  * count). Money rides as integer cents, so the fold is associative and
  * replay-stable (the q97 exactness doctrine inside a state store).
  * Update-mode: a user re-emits only when a batch touches them.
  */
object StreamingUserStats {

  /** One user event, value pre-converted to exact integer cents. */
  final case class UserEvent(user_id: Long, event_type: String, cents: Long)

  /** Running profile emitted after folding each touching batch. */
  final case class UserStats(user_id: Long, n_events: Long,
      total_cents: Long, n_purchases: Long)

  /** The processor: one `ValueState[UserStats]` per user. `ttl` NONE by
    * default (profiles live forever); pass a duration to bound state by
    * the active population instead.
    */
  final class StatsProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, UserEvent, UserStats] {

    @transient private var state: ValueState[UserStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserStats](
        "stats", Encoders.product[UserStats], ttl)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[UserStats] = {
      var s =
        if (state.exists()) state.get()
        else UserStats(key, 0L, 0L, 0L)
      rows.foreach { e =>
        s = UserStats(key, s.n_events + 1, s.total_cents + e.cents,
          s.n_purchases + (if (e.event_type == "purchase") 1L else 0L))
      }
      state.update(s)
      Iterator.single(s)
    }
  }

  /** Fold a (micro-)batch of events into the running profiles. */
  def profile(events: Dataset[UserEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new StatsProcessor(ttl), TimeMode.None(),
        OutputMode.Update())
  }

  /** Output mode required by the sink for [[profile]]. */
  val outputMode: OutputMode = OutputMode.Update()
}
