package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.{EventOps, TimeSeriesOps}
import graft.streaming.StreamingLastTouch
import graft.streaming.StreamingLastTouch.TouchEvent

/** Grades the streaming attribution against the batch q181 window (the
  * stream must assign every purchase the same bucket), and pins the
  * cross-batch state carry that makes it incremental.
  */
class StreamingLastTouchSpec extends SparkSpec {
  import spark.implicits._

  test("batch parity: per-bucket counts match q181's window exactly") {
    val events = EventOps.events(spark, sf)
    val touches = events.select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"))
      .as[TouchEvent]
    val streamed = StreamingLastTouch.attribute(touches)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = TimeSeriesOps.lastTouchAttribution(events)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"stream/batch attribution drifted:\n  stream: $streamed\n  batch: $batch")
  }

  test("a click in run 1 attributes a purchase in run 2 via the state store") {
    val landing = Files.createTempDirectory("graft-touch-in").toString
    val out = Files.createTempDirectory("graft-touch-out").toString
    val ckpt = Files.createTempDirectory("graft-touch-ckpt").toString

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, event_id LONG, ts_us LONG, event_type STRING")
        .parquet(landing)
        .as[TouchEvent]
      val q = StreamingLastTouch.attribute(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    def us(s: String): Long = java.sql.Timestamp.valueOf(s).getTime * 1000

    // run 1: clicks only — no attribution rows yet, state holds the click
    Seq(
      TouchEvent(1L, 10L, us("2024-01-01 10:00:00"), "click"),
      TouchEvent(2L, 20L, us("2024-01-01 10:00:00"), "view")
    ).toDF().write.mode("append").parquet(landing)
    runOnce()
    assert(spark.read.parquet(out).count() == 0)

    // run 2: purchases — user 1 attributes to the run-1 click (1h edge
    // inclusive), user 2 never clicked
    Seq(
      TouchEvent(1L, 11L, us("2024-01-01 11:00:00"), "purchase"),
      TouchEvent(2L, 21L, us("2024-01-01 11:00:00"), "purchase")
    ).toDF().write.mode("append").parquet(landing)
    runOnce()
    val got = spark.read.parquet(out).as[StreamingLastTouch.Attribution]
      .collect().map(a => a.user_id -> a.bucket).toMap
    assert(got == Map(1L -> "within_1h", 2L -> "never_clicked"), s"got $got")
  }

  test("out-of-order click within a batch cannot regress the state") {
    // fold order is (ts, event_id): the older click arrives later in the
    // iterator but must not overwrite the newer one
    val events = Seq(
      TouchEvent(1L, 2L, 2000000L, "click"),
      TouchEvent(1L, 1L, 1000000L, "click"),
      TouchEvent(1L, 3L, 3000000L, "purchase"))
      .toDS()
    val got = StreamingLastTouch.attribute(events).collect()
    assert(got.length == 1 && got(0).bucket == "within_1h")
  }
}
