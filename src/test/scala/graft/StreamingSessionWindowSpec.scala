package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.streaming.StreamingSessionWindow

/** Declarative streaming sessionization: session windows MERGE across
  * micro-batches while open, emit exactly once (final count/sum) when the
  * watermark passes session-end, and drop watermark-late events.
  */
class StreamingSessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts", TimestampType)))

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2025-08-09 $h%02d:$m%02d:00")

  test("sessions merge across batches, emit once finalized, late events drop") {
    val landing = Files.createTempDirectory("graft-sess-landing").toString
    val out = Files.createTempDirectory("graft-sess-out").toString
    val ckpt = Files.createTempDirectory("graft-sess-ckpt").toString

    def run(): Unit =
      StreamingSessionWindow.sessionAggAvailableNow(spark, landing, out, ckpt,
        schema, tsCol = "ts", delay = "30 minutes", gap = "30 minutes")
        .awaitTermination(120000)
    def readOut() = spark.read
      .schema(StructType(Seq(
        StructField("user_id", LongType),
        StructField("session_start", TimestampType),
        StructField("session_end", TimestampType),
        StructField("n_events", LongType),
        StructField("sum_value", DoubleType))))
      .parquet(out)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.substring(11, 16),
        r.getTimestamp(2).toString.substring(11, 16), r.getLong(3),
        r.getDouble(4)))
      .sortBy(t => (t._1, t._2))

    // run 1: user 1 has a 2-event session (10:00, 10:10 -> end 10:40) and
    // a second session (11:30 -> end 12:00); user 2 opens one at 13:00.
    // Final watermark = 13:00 - 30m = 12:30, so both user-1 sessions
    // finalize and user 2's stays open in state.
    Seq((1L, "click", 1.5, ts(10, 0)), (1L, "view", 2.25, ts(10, 10)),
      (1L, "click", 4.0, ts(11, 30)), (2L, "view", 8.0, ts(13, 0)))
      .toDF("user_id", "event_type", "value", "ts")
      .write.mode("append").parquet(landing)
    run()
    assert(readOut().toSeq == Seq(
      (1L, "10:00", "10:40", 2L, 3.75),
      (1L, "11:30", "12:00", 1L, 4.0)),
      s"got ${readOut().toSeq}")

    // run 2 (same checkpoint): 13:20 lands WITHIN the open session's gap
    // -> Spark merges it into the 13:00 session in the state store (end
    // extends to 13:50). The 15:00 event is past the gap (new session)
    // and advances the watermark to 14:30, finalizing the MERGED session
    // as one row with both events. A 10:05 straggler is hours behind the
    // watermark -> dropped, and the emitted 10:00 session is not mutated.
    Seq((2L, "click", 16.0, ts(13, 20)), (2L, "view", 32.0, ts(15, 0)),
      (1L, "click", 100.0, ts(10, 5)))
      .toDF("user_id", "event_type", "value", "ts")
      .write.mode("append").parquet(landing)
    run()
    assert(readOut().toSeq == Seq(
      (1L, "10:00", "10:40", 2L, 3.75),
      (1L, "11:30", "12:00", 1L, 4.0),
      (2L, "13:00", "13:50", 2L, 24.0)),
      s"cross-batch merge must yield ONE session row, got ${readOut().toSeq}")

    // run 3: a 17:00 pusher finalizes the 15:00 session — the merged
    // session must not re-emit
    Seq((2L, "view", 0.5, ts(17, 0)))
      .toDF("user_id", "event_type", "value", "ts")
      .write.mode("append").parquet(landing)
    run()
    assert(readOut().toSeq.count(t => t._1 == 2L && t._2 == "13:00") == 1,
      "finalized sessions must emit exactly once")
    assert(readOut().toSeq.exists(t => t._1 == 2L && t._2 == "15:00" &&
      t._4 == 1L && t._5 == 32.0), s"got ${readOut().toSeq}")
  }

  test("streaming session bounds equal the batch session_window on the same data") {
    // the declarative streaming tier and q34's batch sessionizer share
    // session_window, so a one-shot stream over a closed corpus must
    // reproduce the batch result exactly (exactly-once + watermark have
    // finalized everything behind the pusher)
    val landing = Files.createTempDirectory("graft-sessb-landing").toString
    val out = Files.createTempDirectory("graft-sessb-out").toString
    val ckpt = Files.createTempDirectory("graft-sessb-ckpt").toString
    val data = Seq(
      (1L, "a", 1.0, ts(9, 0)), (1L, "b", 2.0, ts(9, 20)),
      (1L, "c", 3.0, ts(10, 30)), (2L, "d", 4.0, ts(9, 45)),
      // pusher far ahead so the watermark passes every real session
      (99L, "z", 0.0, ts(18, 0)))
    data.toDF("user_id", "event_type", "value", "ts")
      .write.mode("append").parquet(landing)
    StreamingSessionWindow.sessionAggAvailableNow(spark, landing, out, ckpt,
      schema).awaitTermination(120000)

    val streamed = spark.read.parquet(out)
      .select("user_id", "session_start", "n_events", "sum_value")
      .where($"user_id" =!= 99L)
    val batch = data.toDF("user_id", "event_type", "value", "ts")
      .groupBy($"user_id",
        org.apache.spark.sql.functions.session_window($"ts", "30 minutes"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum($"value".cast("decimal(18,6)")), 2)
          .cast("double").as("sum_value"))
      .select($"user_id", $"session_window.start".as("session_start"),
        $"n_events", $"sum_value")
      .where($"user_id" =!= 99L)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streaming sessions must equal the batch session_window result")
  }
}
