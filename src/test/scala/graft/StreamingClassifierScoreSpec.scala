package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.VocabModelOps
import graft.streaming.StreamingClassifierScore

/** Stream-static classifier inference (q314's component): the model
  * trains ONCE in batch on the static corpus (q301's exact-integer
  * epochs), landing micro-batches score against the broadcast
  * vocabulary + weight row with the batch tier's arithmetic, files
  * process exactly once across restarts, and out-of-vocabulary
  * documents drop per the inference contract.
  */
class StreamingClassifierScoreSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("doc_id BIGINT, text STRING")

  test("micro-batches score with batch arithmetic across restarts; OOV drops") {
    val landing = Files.createTempDirectory("graft-cs-landing").toString
    val out = Files.createTempDirectory("graft-cs-out").toString
    val ckpt = Files.createTempDirectory("graft-cs-ckpt").toString
    // static corpus: 'good fine' tokens are pure-English (w = 1e6),
    // 'mal bien' pure-Spanish (w = 0)
    val static = Seq(
      (1L, "en", "good fine"), (2L, "en", "good fine"),
      (3L, "es", "mal bien"), (4L, "es", "mal bien"))
      .toDF("doc_id", "lang", "text")

    def run(): Unit =
      StreamingClassifierScore.scoreAvailableNow(
        spark, landing, static, out, ckpt, schema)
        .awaitTermination(120000)

    // batch 1: one in-vocab English-looking doc, one fully OOV doc
    Seq((11L, "good fine"), (12L, "zzz qqq")).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    run()
    val first = spark.read.parquet(out)
      .select("doc_id", "p4", "pred_en").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(!first.contains(12L), "fully-OOV doc must drop, not score")
    assert(first.contains(11L), s"in-vocab doc must score: $first")
    // arithmetic cross-check against the shared batch expression
    val expect11 = VocabModelOps.inferP4(
        Seq((11L, "good fine")).toDF("doc_id", "text"),
        VocabModelOps.tokenWeights(static),
        VocabModelOps.trainedWeights(static))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(first === expect11, s"stream vs batch: $first vs $expect11")

    // batch 2 (restart): batch-1 files must not reprocess
    Seq((13L, "mal bien")).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    run()
    val all = spark.read.parquet(out)
    assert(all.count() === 2, "restart must not reprocess batch-1 files")
    val p13 = all.where(col("doc_id") === 13L)
      .select("pred_en").collect().head.getBoolean(0)
    // all-Spanish tokens: score 0, far under the sigmoid midpoint
    assert(!p13, "pure-Spanish doc must predict non-English")
  }

  test("streamed delta scores equal the batch inference on the same frame") {
    val landing = Files.createTempDirectory("graft-cs2-landing").toString
    val out = Files.createTempDirectory("graft-cs2-out").toString
    val ckpt = Files.createTempDirectory("graft-cs2-ckpt").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val static = docs.where(col("doc_id") % 5 =!= 0)
    val delta = docs.where(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
    delta.write.mode("append").parquet(landing)
    StreamingClassifierScore.scoreAvailableNow(
      spark, landing, static, out, ckpt, schema)
      .awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select("doc_id", "p4", "pred_en").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val batch = VocabModelOps.inferP4(delta,
        VocabModelOps.tokenWeights(static),
        VocabModelOps.trainedWeights(static))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(streamed === batch,
      s"continuous path drifted from batch inference")
    assert(streamed.nonEmpty)
  }
}
