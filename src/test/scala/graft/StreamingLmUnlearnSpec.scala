package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.VocabModelOps
import graft.streaming.StreamingLmUnlearn

/** Streamed LM unlearning (q381, the 34th streaming component):
  * per-micro-batch exact subtraction must leave the stored relations
  * equal to a from-scratch retrain on the survivors, and a redelivered
  * batch (wiped checkpoint) must subtract NOTHING — subtraction is not
  * idempotent and deletion ids are unordered, so exactly-once lives in
  * the persisted processed-ids gate, not a watermark.
  */
class StreamingLmUnlearnSpec extends SparkSpec {

  test("streamed unlearning == retrain on survivors; redelivery subtracts nothing") {
    val docs = graft.util.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val train = docs.where(col("doc_id") % 2 === 0)
    val tn = VocabModelOps.lmTables("graft_lmuspec")
    VocabModelOps.lmMaterialize(spark, train, "graft_lmuspec")
    StreamingLmUnlearn.resetProcessed(spark, "graft_lmuspec")

    val dels = train.where(col("doc_id") % 13 === 0)
    val mid = docs.agg(expr("max(doc_id) div 2").as("t")).head().getLong(0)
    val landing = Files.createTempDirectory("graft-lmu-landing").toString
    dels.where(col("doc_id") <= mid).coalesce(1)
      .write.mode("append").parquet(landing)
    dels.where(col("doc_id") > mid).coalesce(1)
      .write.mode("append").parquet(landing)
    def run(cp: String): Unit =
      StreamingLmUnlearn.unlearnAvailableNow(spark, landing,
        "graft_lmuspec", cp,
        StructType.fromDDL("doc_id BIGINT, text STRING"),
        maxFilesPerTrigger = Some(1))
        .awaitTermination(120000)
    run(Files.createTempDirectory("graft-lmu-ckpt").toString)

    // streamed relations == a model that never saw the deleted docs
    VocabModelOps.lmMaterialize(spark,
      train.where(col("doc_id") % 13 =!= 0), "graft_lmuspec2")
    def rows(t: String) = spark.table(t).collect().map(_.toSeq).toSet
    assert(rows(tn.c12) === rows("graft_lmuspec2_c12"),
      "streamed subtraction must equal the retrain's bigram relation " +
        "(zero-count rows dropped — no deleted-vocabulary leak)")
    assert(rows(tn.cw) === rows("graft_lmuspec2_cw"),
      "streamed subtraction must equal the retrain's word relation")

    // redelivery with a wiped checkpoint: the processed-ids gate must
    // drain every batch to nothing — one double-subtracted count would
    // break the set equality
    run(Files.createTempDirectory("graft-lmu-ckpt2").toString)
    assert(rows(tn.c12) === rows("graft_lmuspec2_c12"),
      "a redelivered deletion batch must subtract nothing")
    assert(rows(tn.cw) === rows("graft_lmuspec2_cw"))
  }
}
