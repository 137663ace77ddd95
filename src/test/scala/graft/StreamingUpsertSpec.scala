package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.streaming.StreamingUpsert

/** Continuous merge-upsert serving table: parity with batch CDC
  * compaction, tombstones block resurrection by stragglers, and a batch
  * rewrites ONLY the buckets its keys touch.
  */
class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  private def dirs() = (
    Files.createTempDirectory("graft-ups-landing").toString,
    Files.createTempDirectory("graft-ups-table").toString,
    Files.createTempDirectory("graft-ups-ckpt").toString)

  test("serving table equals batch CDC compaction; deletes and restarts hold") {
    val (landing, table, ckpt) = dirs()
    def run(): Unit =
      StreamingUpsert.upsertAvailableNow(spark, landing, table, ckpt,
        schema, nBuckets = 8).awaitTermination(120000)

    val batch1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 2.0),
      (3L, ts("2024-01-01 10:00:00"), 2L, "signup", 3.0),
      (4L, ts("2024-01-01 10:10:00"), 3L, "view", 4.0))
    batch1.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(landing)
    run()

    // user 2 deleted (error tombstone), user 1 updated, in a second run
    val batch2 = Seq(
      (5L, ts("2024-01-01 11:00:00"), 2L, "error", 0.0),
      (6L, ts("2024-01-01 11:05:00"), 1L, "purchase", 9.0))
    batch2.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(landing)
    run()

    val served = StreamingUpsert.serve(spark, table)
    val batchTruth = graft.ops.ShapeOps.cdcCompact(
      (batch1 ++ batch2).toDF("event_id", "ts", "user_id", "event_type", "value"))
    assert(served.exceptAll(batchTruth).isEmpty &&
      batchTruth.exceptAll(served).isEmpty,
      s"served=${served.collect().toSeq} truth=${batchTruth.collect().toSeq}")

    // a STRAGGLER older than the tombstone must not resurrect user 2
    Seq((7L, ts("2024-01-01 10:30:00"), 2L, "click", 99.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(landing)
    run()
    assert(!StreamingUpsert.serve(spark, table).collect()
      .exists(_.getLong(0) == 2L),
      "tombstone must survive an out-of-order straggler")
  }

  test("a batch rewrites only the buckets its keys hash into") {
    val (landing, table, ckpt) = dirs()
    def run(): Unit =
      StreamingUpsert.upsertAvailableNow(spark, landing, table, ckpt,
        schema, nBuckets = 8).awaitTermination(120000)

    // seed many users so several buckets exist
    (1L to 40L).map(u => (u, ts("2024-01-01 09:00:00"), u, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(landing)
    run()

    def bucketFiles: Map[String, Map[String, Long]] = {
      val root = new java.io.File(table)
      root.listFiles().filter(_.getName.startsWith("bucket=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toMap
      }.toMap
    }
    val before = bucketFiles
    assert(before.size > 1, s"fixture should span several buckets: ${before.keys}")

    // one-user update touches exactly one bucket
    val target = 7L
    val targetBucket = {
      import org.apache.spark.sql.functions._
      Seq(target).toDF("user_id")
        .select(pmod(hash(col("user_id")), lit(8)).cast("int")).head().getInt(0)
    }
    Seq((100L, ts("2024-01-01 12:00:00"), target, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(landing)
    run()

    val after = bucketFiles
    before.foreach { case (bucket, files) =>
      if (bucket != s"bucket=$targetBucket")
        assert(after(bucket) == files,
          s"$bucket was rewritten by a batch that never touched it")
    }
    assert(after(s"bucket=$targetBucket") != before(s"bucket=$targetBucket"),
      "the touched bucket must be rewritten")
    // and the update is visible
    assert(StreamingUpsert.serve(spark, table).collect()
      .find(_.getLong(0) == target).get.getString(1) == "purchase")
  }

  test("q168 replay equals batch CDC compaction on the real event table") {
    // the graded query's own body at the smallest sf: the multi-batch
    // streaming replay must land on EXACTLY the snapshot the one-shot
    // batch window computes
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.ops.ShapeOps.upsertReplay(spark, sf).collect()
    val batch = graft.ops.ShapeOps.cdcCompact(
      graft.ops.EventOps.events(spark, sf)).collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq,
      s"streamed=${streamed.length} batch=${batch.length}")
  }
}
