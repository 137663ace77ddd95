package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.{AnnIndexOps, SimilarityOps}
import graft.streaming.StreamingAnnMaintain

/** Streamed ANN index maintenance (q351): per-micro-batch appends
  * against frozen quantizers must equal the batch append exactly, the
  * quantizers must never move, and a redelivered batch (wiped
  * checkpoint) must be a no-op — the exactly-once contract lives in
  * the idempotent append, not the checkpoint.
  */
class StreamingAnnMaintainSpec extends SparkSpec {

  private val schema =
    StructType.fromDDL("vec_id BIGINT, label INT, v ARRAY<DOUBLE>")

  test("streamed append == batch append; quantizers frozen; redelivery is a no-op") {
    val v = SimilarityOps.vectors(spark, sf)
    val base = v.where(col("vec_id") % 5 =!= 0)
    val delta = v.where(col("vec_id") % 5 === 0)
    val q = v.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))

    // batch truth
    AnnIndexOps.buildResidualIndex(spark, base, "graft_amspec_b")
    AnnIndexOps.appendToIndex(spark, delta, "graft_amspec_b")
    val truth = AnnIndexOps.serveTopK(spark, q, "graft_amspec_b")
      .collect().toSeq

    // streamed: two landed slices, one file per micro-batch
    AnnIndexOps.buildResidualIndex(spark, base, "graft_amspec_s")
    val centBefore = spark.table("graft_amspec_s_centroids")
      .collect().toSet
    val booksBefore = spark.table("graft_amspec_s_codebooks")
      .collect().toSet
    val landing = Files.createTempDirectory("graft-annm-landing").toString
    val ckpt = Files.createTempDirectory("graft-annm-ckpt").toString
    delta.where(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(landing)
    delta.where(col("vec_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(landing)
    def run(cp: String): Unit =
      StreamingAnnMaintain.maintainAvailableNow(spark, landing,
        "graft_amspec_s", cp, schema, maxFilesPerTrigger = Some(1))
        .awaitTermination(120000)
    run(ckpt)

    val served = AnnIndexOps.serveTopK(spark, q, "graft_amspec_s")
      .collect().toSeq
    assert(served === truth,
      "serve after streamed appends must equal the batch append's serve")
    assert(spark.table("graft_amspec_s_centroids").collect().toSet ==
      centBefore, "streamed maintenance must never move a centroid")
    assert(spark.table("graft_amspec_s_codebooks").collect().toSet ==
      booksBefore, "streamed maintenance must never move a codebook")

    // redelivery: a FRESH checkpoint replays every landed file; the
    // anti-join must make every re-append a no-op
    val codesRows = spark.table("graft_amspec_s_codes").count()
    val vecRows = spark.table("graft_amspec_s_vectors").count()
    run(Files.createTempDirectory("graft-annm-ckpt2").toString)
    assert(spark.table("graft_amspec_s_codes").count() === codesRows,
      "redelivered batches must not duplicate code rows")
    assert(spark.table("graft_amspec_s_vectors").count() === vecRows,
      "redelivered batches must not duplicate vector rows")
    val again = AnnIndexOps.serveTopK(spark, q, "graft_amspec_s")
      .collect().toSeq
    assert(again === truth, "serve must be unchanged after redelivery")
  }

  test("censusSplit: the stream creates the fat cell, the trigger clears it, redelivery is a no-op") {
    val v = SimilarityOps.vectors(spark, sf)
    AnnIndexOps.buildResidualIndex(spark, v, "graft_amspec_cs")
    assert(AnnIndexOps.indexCellCensus(spark, "graft_amspec_cs")
        .where(col("fat")).count() === 0L,
      "fixture drift: the clean build must start unflagged")
    // the q363 drift pile, landed as two micro-batches
    val shifted = v
      .crossJoin(spark.range(3).select(col("id").as("copy")))
      .select(
        (col("vec_id") + lit(9200000000L) + col("copy") * lit(1000000L))
          .as("vec_id"),
        col("label"),
        expr("transform(v, (x, i) -> 0.05D * x + IF(i = 0, 0.95D, 0D))")
          .as("v"))
    val landing = Files.createTempDirectory("graft-anncs-landing").toString
    shifted.where(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(landing)
    shifted.where(col("vec_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(landing)
    def run(cp: String): Unit =
      StreamingAnnMaintain.maintainAvailableNow(spark, landing,
        "graft_amspec_cs", cp, schema, maxFilesPerTrigger = Some(1),
        censusSplit = true)
        .awaitTermination(240000)
    run(Files.createTempDirectory("graft-anncs-ckpt").toString)
    assert(AnnIndexOps.indexCellCensus(spark, "graft_amspec_cs")
        .where(col("fat")).count() === 0L,
      "the post-batch census trigger must leave no fat cell")
    val expected = v.count() + shifted.count()
    assert(spark.table("graft_amspec_cs_vectors").count() === expected,
      "mid-stream splits move list boundaries, never data")
    // redelivery with a fresh checkpoint: the anti-join drains every
    // batch to nothing, so no append AND no further split runs
    val cents = spark.table("graft_amspec_cs_centroids").collect().toSet
    run(Files.createTempDirectory("graft-anncs-ckpt2").toString)
    assert(spark.table("graft_amspec_cs_centroids").collect().toSet ==
      cents, "redelivery must not re-split an already-repaired index")
    assert(spark.table("graft_amspec_cs_vectors").count() === expected)
  }
}
