package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingUserStats
import graft.streaming.StreamingUserStats.{UserEvent, UserStats}

/** Grades the transformWithState profile processor: exact parity with
  * the batch aggregate over the sf events table, cross-run state carry
  * through the RocksDB store, and update-mode emission scoping (only
  * touched users re-emit). transformWithState REQUIRES the RocksDB
  * state store provider, so each streaming query here sets it; the
  * shared session's default provider is restored after.
  */
class StreamingUserStatsSpec extends SparkSpec {
  import spark.implicits._

  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def toEvents(df: org.apache.spark.sql.DataFrame) =
    df.select(col("user_id"), col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .as[UserEvent]

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
      .schema("user_id LONG, event_type STRING, cents LONG")
      .parquet(landing)
      .as[UserEvent]
    val q = StreamingUserStats.profile(stream)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserStats], _: Long) =>
        batch.write.mode("append").parquet(out); ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming run timed out")
  }

  test("streamed profiles match the batch aggregate exactly on sf events") {
    val ev = graft.ops.EventOps.events(spark, sf)
    val landing = Files.createTempDirectory("graft-us-in").toString
    val out = Files.createTempDirectory("graft-us-out").toString
    val ckpt = Files.createTempDirectory("graft-us-ckpt").toString
    toEvents(ev).write.mode("append").parquet(landing)
    withRocksDb { runOnce(landing, out, ckpt) }

    val streamed = spark.read.parquet(out).as[UserStats].collect()
      .map(s => s.user_id -> ((s.n_events, s.total_cents, s.n_purchases)))
      .toMap
    val batch = toEvents(ev).groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(streamed === batch)
  }

  test("profiles carry across runs; only touched users re-emit") {
    val landing = Files.createTempDirectory("graft-us2-in").toString
    val out = Files.createTempDirectory("graft-us2-out").toString
    val ckpt = Files.createTempDirectory("graft-us2-ckpt").toString

    Seq(UserEvent(1L, "view", 100L), UserEvent(1L, "purchase", 250L),
      UserEvent(2L, "view", 50L))
      .toDF().write.mode("append").parquet(landing)
    withRocksDb { runOnce(landing, out, ckpt) }
    Seq(UserEvent(1L, "purchase", 300L))
      .toDF().write.mode("append").parquet(landing)
    withRocksDb { runOnce(landing, out, ckpt) }

    val rows = spark.read.parquet(out).as[UserStats].collect()
    // user 1 emits in both runs; n_events is monotone so max = latest
    val u1 = rows.filter(_.user_id == 1L).maxBy(_.n_events)
    assert(u1 === UserStats(1L, 3L, 650L, 2L))
    assert(rows.count(_.user_id == 1L) === 2)
    // user 2 untouched by batch 2: exactly one emission
    assert(rows.filter(_.user_id == 2L).toSeq === Seq(UserStats(2L, 1L, 50L, 0L)))
  }
}
