package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.TakedownOps
import graft.streaming.StreamingMediaMaintain

/** Streamed media-fingerprint maintenance (q376, the 30th streaming
  * component): per-micro-batch folds must equal the from-scratch media
  * materialization exactly, and a redelivered batch (wiped checkpoint)
  * must fold nothing — the exactly-once contract lives in the keyed
  * relation's own max-doc_id watermark (every processed doc leaves an
  * ownership row).
  */
class StreamingMediaMaintainSpec extends SparkSpec {

  test("streamed folds == from-scratch media tier; redelivery folds nothing") {
    import spark.implicits._
    val docs = graft.util.Tables.t(spark, sf, "documents")
      .select(col("doc_id"))
    val cut = docs.agg(expr("max(doc_id) * 4 div 5").as("t")).head()
      .getLong(0)
    val tn = TakedownOps.mediaTables("graft_mmspec")
    TakedownOps.mediaMaterialize(spark,
      docs.where(col("doc_id") <= cut), "graft_mmspec")

    val tail = docs.where(col("doc_id") > cut)
    val mid = docs.agg(expr("max(doc_id) * 9 div 10").as("t")).head()
      .getLong(0)
    val landing = Files.createTempDirectory("graft-mm-landing").toString
    tail.where(col("doc_id") <= mid).coalesce(1)
      .write.mode("append").parquet(landing)
    tail.where(col("doc_id") > mid).coalesce(1)
      .write.mode("append").parquet(landing)
    def run(cp: String): Unit =
      StreamingMediaMaintain.maintainAvailableNow(spark, landing,
        "graft_mmspec", cp, StructType.fromDDL("doc_id BIGINT"),
        maxFilesPerTrigger = Some(1))
        .awaitTermination(120000)
    run(Files.createTempDirectory("graft-mm-ckpt").toString)

    // streamed state == from-scratch materialization of the union,
    // row for row, all three relations
    TakedownOps.mediaMaterialize(spark, docs, "graft_mmspec2")
    def rows(t: String) = spark.table(t).collect().map(_.toSeq).toSet
    assert(rows(tn.keyed) === rows("graft_mmspec2_mkeyed"),
      "streamed ownership rows must equal the from-scratch relation")
    assert(rows(tn.sigs) === rows("graft_mmspec2_msigs"),
      "streamed fingerprints must equal the from-scratch relation")
    assert(rows(tn.clusters) === rows("graft_mmspec2_mclusters"),
      "streamed cluster groups must equal the from-scratch relation")

    // redelivery: a FRESH checkpoint replays every landed file; the
    // keyed relation's own watermark must make every re-fold a no-op
    val keyedRows = spark.table(tn.keyed).count()
    val sigRows = spark.table(tn.sigs).count()
    run(Files.createTempDirectory("graft-mm-ckpt2").toString)
    assert(spark.table(tn.keyed).count() === keyedRows,
      "redelivered batches must not duplicate ownership rows")
    assert(spark.table(tn.sigs).count() === sigRows,
      "redelivered batches must not re-fingerprint known payloads")
    assert(rows(tn.clusters) === rows("graft_mmspec2_mclusters"),
      "cluster groups must be unchanged after redelivery")
  }
}
