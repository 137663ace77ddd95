package graft

import java.nio.file.Files

import graft.gen.SalesGen
import graft.streaming.StreamingIngest

/** The streaming analogue of C1: files land, AvailableNow drains exactly
  * the new ones (checkpointed), silver schema matches the batch transform.
  */
class StreamingIngestSpec extends SparkSpec {

  test("AvailableNow ingest is incremental and exactly-once across runs") {
    val landing = Files.createTempDirectory("graft-landing").toString
    val out = Files.createTempDirectory("graft-silver-stream").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    SalesGen.initialBatch(spark, n = 100, seed = 1L).toDF()
      .write.mode("append").parquet(landing)
    val q1 = StreamingIngest.silverAvailableNow(spark, landing, out, ckpt)
    q1.awaitTermination(120000)
    assert(spark.read.parquet(out).count() == 100)

    // second batch lands; rerun processes ONLY the new files
    SalesGen.dailyBatch(spark, java.time.LocalDate.of(2025, 8, 9),
      startId = 101, n = 25, seed = 2L).toDF()
      .write.mode("append").parquet(landing)
    val q2 = StreamingIngest.silverAvailableNow(spark, landing, out, ckpt)
    q2.awaitTermination(120000)

    val silver = spark.read.parquet(out)
    assert(silver.count() == 125, "no duplicates, no misses across restarts")
    // streamed silver equals the batch transform of the same bronze
    val batch = graft.etl.Pipeline.silverTransform(spark.read
      .schema(graft.model.Sales.bronzeSchema).parquet(landing))
    assert(silver.except(batch).isEmpty && batch.except(silver).isEmpty)
  }
}
