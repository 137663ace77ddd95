package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.EventOps

/** Event-time semantics: batch sessionization on crafted timestamps, and
  * the same windowed aggregation driven through Structured Streaming
  * (readStream over the events parquet + watermark + memory sink) to prove
  * the streaming path (SURVEY §2.11 extension).
  */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionization merges gaps <= 30 minutes, splits strictly greater") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:20:00"), 1.0), // same session (20m gap)
      (1L, ts("2024-01-01 10:50:00"), 1.0), // exactly 30m -> still merged
      (1L, ts("2024-01-01 11:20:01"), 1.0), // 30m 1s -> new session
      (2L, ts("2024-01-01 09:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = EventOps.sessions(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSet == Set(
      (1L, "2024-01-01 10:00:00", 3L),
      (1L, "2024-01-01 11:20:01", 1L),
      (2L, "2024-01-01 09:00:00", 1L)))
  }

  test("hourly window agg counts every event exactly once") {
    val ev = EventOps.events(spark, sf)
    val df = EventOps.hourlyWindow(ev)
    val total = df.agg(sum("n_events")).first().getLong(0)
    assert(total == ev.count())
  }

  test("streaming hourly agg over events parquet matches batch") {
    // file-source streaming wants a directory: stage the parquet into one
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    val src = java.nio.file.Paths.get(s"$sf/events.parquet")
    java.nio.file.Files.copy(src, dir.resolve("events.parquet"))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    // same data-vintage dispatch as EventOps.events: legacy int64-nanos
    // generations need the µs conversion; native timestamp[us] reads as
    // NTZ, which watermarks reject — cast to session-zone TIMESTAMP (UTC)
    val stream =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw.withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("n_events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("hourly_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_stream")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = EventOps.hourlyWindow(EventOps.events(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }
}
