package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.{BoundedTopK, RankedItem, TopKState}

/** Streaming tier of q187's bounded top-k: the per-segment "top 5
  * orders" leaderboard maintained INCREMENTALLY as orders land, instead
  * of re-ranking the fact table per refresh. State per segment is the
  * SAME bounded buffer the batch aggregate carries
  * ([[graft.functions.BoundedTopK]] — its `reduce` is called verbatim
  * here, so the continuous and batch paths share one fold and cannot
  * drift), and the buffer's total (value desc, id asc) ordering makes
  * the fold commutative: ANY slicing of the stream lands the same final
  * leaderboard the batch window computes, which is why the replay is
  * graded against q187's own full SQL oracle (the q308/q310
  * two-mechanisms-one-output doctrine — window sort vs incremental
  * bounded state).
  *
  * Scale shape: state is k longs × 2 per DISTINCT segment — a
  * leaderboard over a 100 TB order stream holds |segments|·k entries,
  * nothing else; each micro-batch folds only its own rows. Update-mode:
  * a segment re-emits its current leaderboard only when a batch touches
  * it, with `batch_id` riding for the idempotent-consumer read
  * (max_by(·, batch_id) per segment keeps at-least-once appends safe).
  */
object StreamingTopK {

  /** One landed order, value pre-converted to exact integer cents. */
  final case class OrderRow(segment: String, cents: Long, o_orderkey: Long)

  /** The leaderboard emitted after folding each touching batch. */
  final case class TopKRows(segment: String, values: Array[Long],
      ids: Array[Long])

  final class TopKProcessor(k: Int)
      extends StatefulProcessor[String, OrderRow, TopKRows] {

    @transient private var state: ValueState[TopKState] = _
    @transient private lazy val agg = BoundedTopK(k)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TopKState](
        "topk", Encoders.product[TopKState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[OrderRow],
        timers: TimerValues): Iterator[TopKRows] = {
      var s = if (state.exists()) state.get() else agg.zero
      rows.foreach(r => s = agg.reduce(s, RankedItem(r.cents, r.o_orderkey)))
      state.update(s)
      Iterator.single(TopKRows(key, s.values, s.ids))
    }
  }

  /** Fold a (micro-)batch of orders into the per-segment leaderboards. */
  def topkPerSegment(orders: Dataset[OrderRow], k: Int = 5): Dataset[TopKRows] = {
    import orders.sparkSession.implicits._
    orders.groupByKey(_.segment)
      .transformWithState(new TopKProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }

  /** Output mode required by the sink for [[topkPerSegment]]. */
  val outputMode: OutputMode = OutputMode.Update()
}
