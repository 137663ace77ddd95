package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingIntervalJoin

/** Stream-stream interval join: attribution semantics (in-horizon pairs
  * only, per-user isolation) and streaming == batch for the same inputs.
  */
class StreamingIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Ev(user_id: Long, event_id: Long, ts: Timestamp)

  private val views = Seq(
    Ev(1L, 100L, ts("2024-01-01 10:00:00")),
    Ev(1L, 101L, ts("2024-01-01 10:30:00")),
    Ev(2L, 102L, ts("2024-01-01 10:00:00")))
  private val clicks = Seq(
    Ev(1L, 200L, ts("2024-01-01 10:05:00")), // attributes to view 100
    Ev(1L, 201L, ts("2024-01-01 10:35:00")), // attributes to view 101 ONLY (100 is 35m stale)
    Ev(2L, 202L, ts("2024-01-01 10:20:00")), // out of horizon for view 102 (20m > 10m)
    Ev(2L, 203L, ts("2024-01-01 09:55:00"))) // click BEFORE the view -> never attributed

  private val expected = Set((1L, 100L, 200L), (1L, 101L, 201L))

  test("streaming interval join attributes exactly the in-horizon pairs") {
    implicit val sqlCtx = spark.sqlContext
    val vs = MemoryStream[Ev]
    val cs = MemoryStream[Ev]
    vs.addData(views: _*)
    cs.addData(clicks: _*)

    val joined = StreamingIntervalJoin.attribute(vs.toDF(), cs.toDF())
    val q = joined.writeStream
      .format("memory").queryName("attrib")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("attrib").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"got $got")
  }

  private def batchDF(evs: Seq[Ev]) =
    evs.map(e => (e.user_id, e.event_id, e.ts)).toDF("user_id", "event_id", "ts")

  test("streaming result equals the equivalent batch interval join") {
    val batch = StreamingIntervalJoin.attribute(batchDF(views), batchDF(clicks))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == expected, s"batch gave $batch")
  }

  test("the join condition carries the state-eviction time bound") {
    // the plan's join condition must constrain click_ts to a FINITE
    // window of view_ts on both sides — this is what lets the engine
    // evict buffered state; an equality-only join would be correct but
    // unbounded
    val plan = StreamingIntervalJoin.attribute(batchDF(views), batchDF(clicks))
      .queryExecution.analyzed.toString
    assert(plan.contains(">=") && plan.contains("<="),
      s"expected a two-sided time-range join condition in:\n$plan")
  }

  test("left outer: unmatched views emit null-padded after the watermark clears them") {
    implicit val sqlCtx = spark.sqlContext
    val vs = MemoryStream[Ev]
    val cs = MemoryStream[Ev]
    vs.addData(views: _*)
    cs.addData(clicks: _*)
    // sentinels a day later advance both watermarks past every real
    // view's eviction bound, draining the unmatched tail; distinct
    // negative users keep the two sentinels from pairing with each
    // other, so each stays buffered (its own bound is past the final
    // watermark) and must NOT reach the sink
    vs.addData(Ev(-1L, -1L, ts("2024-01-02 10:00:00")))
    cs.addData(Ev(-2L, -1L, ts("2024-01-02 10:00:00")))

    val q = StreamingIntervalJoin.attributeLeftOuter(vs.toDF(), cs.toDF())
      .writeStream
      .format("memory").queryName("attrib_lo")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val rows = spark.table("attrib_lo").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    // view 102 had no in-horizon click -> exactly one null-padded row;
    // matched views 100/101 emit their pairs and no null row
    assert(rows === Set(
      (1L, 100L, Some(200L)),
      (1L, 101L, Some(201L)),
      (2L, 102L, None)), s"got $rows")
  }
}
