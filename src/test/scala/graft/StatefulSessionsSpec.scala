package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.SessionEvent

/** State persists across AvailableNow restarts: run 1 leaves an open
  * session in the state store; run 2's later events close it and emit it.
  */
class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val GAP_US = 30L * 60 * 1000 * 1000

  test("flatMapGroupsWithState closes sessions across two streaming runs") {
    val landing = Files.createTempDirectory("graft-sess-in").toString
    val out = Files.createTempDirectory("graft-sess-out").toString
    val ckpt = Files.createTempDirectory("graft-sess-ckpt").toString

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, ts_us LONG, value DOUBLE")
        .parquet(landing)
        .as[SessionEvent]
      val q = StatefulSessions.sessionize(stream, GAP_US)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    def t(s: String): Long = java.sql.Timestamp.valueOf(s).getTime * 1000

    // run 1: an open session for user 1 — nothing should be emitted yet
    Seq(
      SessionEvent(1L, t("2024-01-01 10:00:00"), 1.0),
      SessionEvent(1L, t("2024-01-01 10:10:00"), 2.0)
    ).toDF().write.mode("append").parquet(landing)
    runOnce()
    assert(spark.read.parquet(out).count() == 0,
      "open session must stay in state, not emit")

    // run 2: a later event past the gap closes the run-1 session
    Seq(SessionEvent(1L, t("2024-01-01 12:00:00"), 5.0))
      .toDF().write.mode("append").parquet(landing)
    runOnce()
    val closed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(closed.toSeq == Seq((1L, "2024-01-01 10:00:00", 2L, 3.0)),
      s"got ${closed.toSeq}")
  }

  test("batch sessionize splits on the same strict-gap rule as session_window") {
    def t(s: String): Long = java.sql.Timestamp.valueOf(s).getTime * 1000
    val events = Seq(
      SessionEvent(1L, t("2024-01-01 10:00:00"), 1.0),
      SessionEvent(1L, t("2024-01-01 10:30:00"), 1.0), // exactly the gap: merged
      SessionEvent(1L, t("2024-01-01 11:00:01"), 1.0), // 30m1s: new session
      SessionEvent(2L, t("2024-01-01 09:00:00"), 4.0)
    ).toDS()
    // batch mode: state starts empty per group and open sessions are not
    // emitted — only the one closed by the strict gap appears
    val closed = StatefulSessions.sessionize(events, GAP_US).collect()
    assert(closed.toSeq.map(c => (c.user_id, c.session_start, c.n_events)) ==
      Seq((1L, "2024-01-01 10:00:00", 2L)))
  }
}
