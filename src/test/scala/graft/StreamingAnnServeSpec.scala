package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.{AnnIndexOps, SimilarityOps}
import graft.streaming.StreamingAnnServe

/** Streamed ANN query service (q345's component): micro-batched serves
  * equal the batch serve on the same query set, files process exactly
  * once across restarts, and nothing refits.
  */
class StreamingAnnServeSpec extends SparkSpec {

  private val schema = StructType.fromDDL("q_id BIGINT, qv ARRAY<DOUBLE>")

  test("micro-batched serves equal the batch serve; exactly-once restarts") {
    val landing = Files.createTempDirectory("graft-annsrv-landing").toString
    val out = Files.createTempDirectory("graft-annsrv-out").toString
    val ckpt = Files.createTempDirectory("graft-annsrv-ckpt").toString
    val v = SimilarityOps.vectors(spark, sf)
    AnnIndexOps.buildResidualIndex(spark, v, "graft_annsrvspec")
    def queries(lo: Long, hi: Long) =
      v.where(col("vec_id") >= lo && col("vec_id") < hi)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))

    def run(): Unit =
      StreamingAnnServe.serveAvailableNow(
        spark, landing, "graft_annsrvspec", out, ckpt, schema)
        .awaitTermination(180000)

    queries(0L, 6L).write.mode("append").parquet(landing)
    run()
    // restart with a second query batch: batch-1 files must not
    // reprocess, and the combined drained results must equal ONE batch
    // serve over all 12 queries
    queries(6L, 12L).write.mode("append").parquet(landing)
    run()
    val drained = spark.read.parquet(out)
    assert(drained.count() === 12L * 5,
      "exactly one top-5 per query across restarts")
    val streamed = drained.select("q_id", "rnk", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = AnnIndexOps.serveTopK(spark, queries(0L, 12L),
        "graft_annsrvspec")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(streamed === batch,
      "the streamed service drifted from the batch serve")
  }
}
