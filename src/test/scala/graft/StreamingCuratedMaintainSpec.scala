package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.{CurationOps, TakedownOps}
import graft.streaming.StreamingCuratedMaintain

/** Streamed curated maintenance (q361): per-micro-batch scrub-appends
  * against the stored provenance must equal the from-scratch
  * materialization exactly, and a redelivered batch (wiped checkpoint)
  * must be a no-op — the exactly-once contract lives in the doc_id
  * high-watermark, not the checkpoint.
  */
class StreamingCuratedMaintainSpec extends SparkSpec {

  private val schema =
    StructType.fromDDL("doc_id BIGINT, lang STRING, text STRING")

  test("streamed append == from-scratch materialization; redelivery is a no-op") {
    val docs = graft.util.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val cut = docs.agg(expr("max(doc_id) * 4 div 5").as("t")).head()
      .getLong(0)
    val tn = TakedownOps.curatedMaterializeWithProvenance(spark,
      docs.where(col("doc_id") <= cut), "graft_cmspec")

    // the id-ordered tail as two landed files, one per micro-batch
    val tail = docs.where(col("doc_id") > cut)
    val mid = docs.agg(expr("max(doc_id) * 9 div 10").as("t")).head()
      .getLong(0)
    val landing = Files.createTempDirectory("graft-cm-landing").toString
    tail.where(col("doc_id") <= mid).coalesce(1)
      .write.mode("append").parquet(landing)
    tail.where(col("doc_id") > mid).coalesce(1)
      .write.mode("append").parquet(landing)
    def run(cp: String): Unit =
      StreamingCuratedMaintain.maintainAvailableNow(spark, landing,
        "graft_cmspec", cp, schema, maxFilesPerTrigger = Some(1))
        .awaitTermination(120000)
    run(Files.createTempDirectory("graft-cm-ckpt").toString)

    // from-scratch truth over the full corpus
    CurationOps.curatedMaterialize(spark, docs)
    val truth = spark.table("graft_curated")
      .select(col("doc_id"), col("lang"), col("text"), col("n_toks"))
    val grown = spark.table(tn.curated)
      .select(col("doc_id"), col("lang"), col("text"), col("n_toks"))
    assert(grown.exceptAll(truth).isEmpty && truth.exceptAll(grown).isEmpty,
      "streamed maintenance must reproduce the from-scratch curated table")

    // redelivery: a FRESH checkpoint replays every landed file; the
    // high-watermark must make every re-append a no-op
    val curRows = spark.table(tn.curated).count()
    val parRows = spark.table(tn.pars).count()
    val bktRows = spark.table(tn.buckets).count()
    run(Files.createTempDirectory("graft-cm-ckpt2").toString)
    assert(spark.table(tn.curated).count() === curRows,
      "redelivered batches must not duplicate curated rows")
    assert(spark.table(tn.pars).count() === parRows,
      "redelivered batches must not duplicate paragraph rows")
    assert(spark.table(tn.buckets).count() === bktRows,
      "redelivered batches must not duplicate bucket rows")
  }
}
