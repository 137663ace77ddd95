package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingScd2
import graft.streaming.StreamingScd2.ChangeEvent

/** Streaming SCD2: closed versions emit exactly once across restarts,
  * open versions live only in state, and over an in-order changelog the
  * emitted rows equal the batch build's (q120) non-current rows.
  */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Long = java.sql.Timestamp.valueOf(s).getTime

  test("state change closes a version across two streaming runs; same state absorbs") {
    val landing = Files.createTempDirectory("graft-scd2-in").toString
    val out = Files.createTempDirectory("graft-scd2-out").toString
    val ckpt = Files.createTempDirectory("graft-scd2-ckpt").toString

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, event_id LONG, event_type STRING, ts_ms LONG")
        .parquet(landing)
        .as[ChangeEvent]
      val q = StreamingScd2(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    // run 1: open version + one same-state absorb — nothing emits
    Seq(
      ChangeEvent(1L, 1L, "view", t("2024-01-01 10:00:00")),
      ChangeEvent(1L, 2L, "view", t("2024-01-01 11:00:00"))
    ).toDF().write.mode("append").parquet(landing)
    runOnce()
    assert(spark.read.parquet(out).count() == 0,
      "open version must stay in state, not emit")

    // run 2: a state change closes version 1; a late event is dropped
    Seq(
      ChangeEvent(1L, 3L, "click", t("2024-01-01 12:00:00")),
      ChangeEvent(1L, 4L, "stale", t("2024-01-01 09:00:00")) // late: behind history
    ).toDF().write.mode("append").parquet(landing)
    runOnce()
    val closed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(closed.toSeq == Seq(
      (1L, 1, "view", "2024-01-01 10:00:00", "2024-01-01 12:00:00")),
      s"got ${closed.toSeq}")
  }

  test("batch parity: emitted closed rows equal scd2Dim's non-current rows") {
    val fixture = Seq(
      (1L, 1L, "view", 0.0, "2024-01-01 10:00:00"),
      (2L, 1L, "view", 0.0, "2024-01-01 11:00:00"),
      (3L, 1L, "click", 0.0, "2024-01-01 12:00:00"),
      (4L, 2L, "signup", 0.0, "2024-01-01 09:00:00"),
      (5L, 3L, "a", 0.0, "2024-01-01 10:00:00"),
      (6L, 3L, "b", 0.0, "2024-01-01 10:00:00"), // same-ts tie: event_id order
      (7L, 3L, "a", 0.0, "2024-01-01 11:00:00")
    )
    val streamed = StreamingScd2(
      fixture.map { case (eid, uid, st, _, ts) => ChangeEvent(uid, eid, st, t(ts)) }
        .toDS())
      .collect()
      .map(c => (c.user_id, c.version, c.state, c.valid_from, c.valid_to))
      .sortBy(r => (r._1, r._2))
    val batch = graft.ops.ShapeOps.scd2Dim(
      fixture.map { case (eid, uid, st, v, ts) =>
        (eid, uid, st, v, java.sql.Timestamp.valueOf(ts))
      }.toDF("event_id", "user_id", "event_type", "value", "ts"))
      .where(col("is_current") === 0)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4)))
      .sortBy(r => (r._1, r._2))
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
  }
}
