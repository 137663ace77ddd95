package graft.streaming

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental SCD Type 2 maintenance via `flatMapGroupsWithState` — the
  * streaming counterpart of the q120 batch build (ShapeOps.scd2Dim).
  *
  * Each key carries its OPEN dimension version in the state store; a
  * micro-batch's change events are folded in (ts, event_id) order.
  * A state CHANGE closes the open version — the closed row (with its
  * valid_to stamped from the successor's ts) is emitted downstream,
  * exactly the append-mode contract: a row is emitted once, when it is
  * final, and never retracted. The still-open version persists in state
  * across micro-batches and checkpoint restarts; consecutive identical
  * states are absorbed without a new version (the same change-collapse
  * rule the batch body applies).
  *
  * Late-data policy: an event at-or-before the key's last folded
  * (ts, event_id) cannot be inserted into already-emitted history, so it
  * is dropped (the streaming analogue of a watermark bound; the spec
  * pins the behavior). Batch parity: over the same in-order changelog,
  * the emitted closed rows equal the batch build's non-current rows —
  * StreamingScd2Spec asserts the frames match row for row.
  *
  * Scale shape: state is ONE small record per key (the open version),
  * independent of history length — emitted rows leave the store, so the
  * state size is bounded by key cardinality, not by time.
  */
object StreamingScd2 {

  final case class ChangeEvent(
      user_id: Long, event_id: Long, event_type: String, ts_ms: Long)
  final case class OpenVersion(
      state: String, from_ms: Long, version: Int, last_ms: Long, last_id: Long)
  final case class ClosedVersion(
      user_id: Long, version: Int, state: String, valid_from: String, valid_to: String)

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)

  private def stamp(ms: Long): String = fmt.format(Instant.ofEpochMilli(ms))

  /** Fold one key's micro-batch into the open-version state; emit
    * versions closed by a state change.
    */
  def update(user: Long, events: Iterator[ChangeEvent],
      state: GroupState[OpenVersion]): Iterator[ClosedVersion] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_ms, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedVersion]
    sorted.foreach { e =>
      open match {
        case None =>
          open = Some(OpenVersion(e.event_type, e.ts_ms, 1, e.ts_ms, e.event_id))
        case Some(o) if e.ts_ms < o.last_ms ||
            (e.ts_ms == o.last_ms && e.event_id <= o.last_id) =>
          () // late arrival behind already-folded history: dropped
        case Some(o) if e.event_type == o.state =>
          // same state: absorb, no new version (change-collapse rule)
          open = Some(o.copy(last_ms = e.ts_ms, last_id = e.event_id))
        case Some(o) =>
          closed += ClosedVersion(user, o.version, o.state,
            stamp(o.from_ms), stamp(e.ts_ms))
          open = Some(OpenVersion(e.event_type, e.ts_ms, o.version + 1,
            e.ts_ms, e.event_id))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Streaming (or batch) incremental SCD2: one state entry per key. */
  def apply(changes: Dataset[ChangeEvent]): Dataset[ClosedVersion] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update)
  }
}
