package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.streaming.StreamingDedup

/** Streaming dedup: duplicate keys within the watermark window are dropped
  * exactly once, across micro-batches and across query restarts (state
  * lives in the checkpoint).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  private def ts(m: Int) = Timestamp.valueOf(f"2025-08-09 10:$m%02d:00")

  test("duplicates within the watermark are dropped across restarts") {
    val landing = Files.createTempDirectory("graft-dedup-landing").toString
    val out = Files.createTempDirectory("graft-dedup-out").toString
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString

    def run(): Unit =
      StreamingDedup.dedupAvailableNow(spark, landing, out, ckpt,
        schema, tsCol = "ts", delay = "30 minutes", keys = Seq("doc_id"))
        .awaitTermination(120000)

    // batch 1: doc 2 arrives twice in the same batch
    Seq((1L, ts(0), "a"), (2L, ts(1), "b"), (2L, ts(2), "b-retry"))
      .toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(landing)
    run()
    val first = spark.read.schema(schema).parquet(out)
    assert(first.count() == 2, "in-batch duplicate dropped")

    // batch 2 (new files, restarted query): doc 1 re-arrives within the
    // 30-minute watermark -> dropped via checkpointed state; doc 3 is new
    Seq((1L, ts(5), "a-retry"), (3L, ts(6), "c"))
      .toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(landing)
    run()
    val all = spark.read.schema(schema).parquet(out)
    assert(all.count() == 3, "cross-restart duplicate dropped, new doc kept")
    assert(all.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
