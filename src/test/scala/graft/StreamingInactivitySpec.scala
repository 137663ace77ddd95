package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingInactivity
import graft.streaming.StreamingInactivity.{Churned, Seen}

/** Event-time timer semantics: a silent user emits exactly one churn
  * record once the WATERMARK (driven by other users' later events)
  * passes their last-seen + gap deadline; active users re-arm and stay
  * unflagged; a flagged user's state clears. Uses the RocksDB provider
  * transformWithState requires.
  */
class StreamingInactivitySpec extends SparkSpec {
  import spark.implicits._

  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, rocksdb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def runOnce(landing: String, out: String, ckpt: String): Unit = {
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .parquet(landing)
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), expr("unix_millis(ts)").as("ts_ms"))
      .as[Seen]
    val q = StreamingInactivity.churnFlags(stream, gapMs = 30 * 60 * 1000L)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Churned], _: Long) =>
        batch.write.mode("append").parquet(out); ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming run timed out")
  }

  private def ms(t: String): Long =
    java.sql.Timestamp.valueOf(t).getTime

  test("a silent user churns when the watermark passes their deadline; active users don't") {
    val landing = Files.createTempDirectory("graft-ia-in").toString
    val out = Files.createTempDirectory("graft-ia-out").toString
    val ckpt = Files.createTempDirectory("graft-ia-ckpt").toString

    def land(rows: (Long, String)*): Unit =
      rows.toDF("user_id", "t")
        .select(col("user_id"), col("t").cast("timestamp").as("ts"))
        .write.mode("append").parquet(landing)

    // run 1: user 1 last seen 10:00 (deadline 10:30), user 2 at 10:05
    land((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:05:00"))
    withRocksDb { runOnce(landing, out, ckpt) }
    // run 2: user 2 returns at 11:30 -> watermark 11:30 passes user 1's
    // 10:30 deadline; user 2 re-arms to 12:00 and must NOT be flagged
    land((2L, "2024-01-01 11:30:00"))
    withRocksDb { runOnce(landing, out, ckpt) }

    val afterTwo = spark.read.parquet(out).as[Churned].collect()
    assert(afterTwo.toSeq === Seq(
      Churned(1L, ms("2024-01-01 10:00:00"),
        ms("2024-01-01 10:00:00") + 30 * 60 * 1000L)))

    // run 3: user 3 appears at 13:00 -> watermark passes user 2's 12:00
    // deadline, flagging the LAST seen time (11:30, not 10:05)
    land((3L, "2024-01-01 13:00:00"))
    withRocksDb { runOnce(landing, out, ckpt) }
    val afterThree = spark.read.parquet(out).as[Churned].collect()
      .sortBy(_.user_id)
    assert(afterThree.map(_.user_id).toSeq === Seq(1L, 2L))
    assert(afterThree(1) === Churned(2L, ms("2024-01-01 11:30:00"),
      ms("2024-01-01 11:30:00") + 30 * 60 * 1000L))
  }
}
