package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.streaming.StreamingWindowedAgg

/** Watermarked tumbling-window aggregation: append mode emits each window
  * exactly once with its FINAL aggregate (only after the watermark passes
  * the window end), later runs finalize the windows the watermark had not
  * reached, and events later than the watermark delay are dropped rather
  * than mutating an already-emitted window.
  */
class StreamingWindowedAggSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts", TimestampType)))

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2025-08-09 $h%02d:$m%02d:00")

  test("append mode emits finalized windows once; late events beyond the watermark drop") {
    val landing = Files.createTempDirectory("graft-wagg-landing").toString
    val out = Files.createTempDirectory("graft-wagg-out").toString
    val ckpt = Files.createTempDirectory("graft-wagg-ckpt").toString

    def run(): Unit =
      StreamingWindowedAgg.windowedAggAvailableNow(spark, landing, out, ckpt,
        schema, tsCol = "ts", delay = "30 minutes", width = "1 hour")
        .awaitTermination(120000)
    def readOut() = spark.read
      .schema(StructType(Seq(
        StructField("window_start", TimestampType),
        StructField("window_end", TimestampType),
        StructField("event_type", StringType),
        StructField("n_events", LongType),
        StructField("sum_value", DoubleType))))
      .parquet(out)
      .collect().map(r => (r.getTimestamp(0).toString.substring(11, 13),
        r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))

    // run 1: windows 10-11 (2 events), 11-12 (1), 12-13 (1). Final
    // watermark = 12:40 - 30m = 12:10, so exactly the 10h and 11h windows
    // finalize (end <= watermark); the 12h window stays in state.
    Seq(("click", 1.5, ts(10, 0)), ("click", 2.25, ts(10, 15)),
      ("view", 4.0, ts(11, 50)), ("click", 8.0, ts(12, 40)))
      .toDF("event_type", "value", "ts")
      .write.mode("append").parquet(landing)
    run()
    assert(readOut().toSeq == Seq(
      ("10", "click", 2L, 3.75), ("11", "view", 1L, 4.0)),
      s"got ${readOut().toSeq}")

    // run 2 (same checkpoint): a 14:10 event advances the watermark to
    // 13:40, finalizing the 12h window; the 10:30 event is 3+ hours
    // behind the watermark -> DROPPED, and the already-emitted 10h window
    // is not re-emitted or mutated.
    Seq(("click", 100.0, ts(10, 30)), ("view", 16.0, ts(14, 10)))
      .toDF("event_type", "value", "ts")
      .write.mode("append").parquet(landing)
    run()
    assert(readOut().toSeq == Seq(
      ("10", "click", 2L, 3.75), ("11", "view", 1L, 4.0),
      ("12", "click", 1L, 8.0)),
      s"late event must not appear or mutate emitted windows, got ${readOut().toSeq}")
  }

  test("hopping windows: each overlapping window finalizes independently, once") {
    val landing = Files.createTempDirectory("graft-hop-landing").toString
    val out = Files.createTempDirectory("graft-hop-out").toString
    val ckpt = Files.createTempDirectory("graft-hop-ckpt").toString

    // 1h window, 30m slide: an event at 10:15 lands in windows starting
    // 09:30 and 10:00. The 12:00 pusher moves the watermark to 11:30,
    // finalizing both (ends 10:30/11:00 <= 11:30) — two rows, same event
    // counted in each, emitted exactly once.
    Seq(("click", 2.0, ts(10, 15)), ("view", 1.0, ts(12, 0)))
      .toDF("event_type", "value", "ts")
      .write.mode("append").parquet(landing)
    StreamingWindowedAgg.windowedAggAvailableNow(spark, landing, out, ckpt,
      schema, tsCol = "ts", delay = "30 minutes", width = "1 hour",
      slide = "30 minutes").awaitTermination(120000)

    val rows = spark.read
      .schema(StructType(Seq(
        StructField("window_start", TimestampType),
        StructField("window_end", TimestampType),
        StructField("event_type", StringType),
        StructField("n_events", LongType),
        StructField("sum_value", DoubleType))))
      .parquet(out)
      .collect()
      .map(r => (r.getTimestamp(0).toString.substring(11, 16),
        r.getString(2), r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("09:30", "click", 1L, 2.0), ("10:00", "click", 1L, 2.0)),
      s"got ${rows.toSeq}")
  }
}
