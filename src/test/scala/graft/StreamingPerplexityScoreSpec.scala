package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.VocabModelOps
import graft.streaming.StreamingPerplexityScore

/** Stream-static perplexity gate (q333's component): the bigram LM
  * trains ONCE in batch on the static slice, landing micro-batches
  * score in the exact micro-bits arithmetic of the batch tier, files
  * process exactly once across restarts, and sub-bigram documents
  * score no rows per the q328 contract.
  */
class StreamingPerplexityScoreSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("doc_id BIGINT, text STRING")

  test("micro-batches score with batch micro-bits across restarts") {
    val landing = Files.createTempDirectory("graft-ppl-landing").toString
    val out = Files.createTempDirectory("graft-ppl-out").toString
    val ckpt = Files.createTempDirectory("graft-ppl-ckpt").toString
    // the hand-computed q328 fixture: train "a b" -> V=2, c12(a,b)=1,
    // c1(a)=1; scoring "a b" costs exactly L(3)-L(2) = 584963
    val static = Seq((0L, "a b")).toDF("doc_id", "text")

    def run(): Unit =
      StreamingPerplexityScore.scoreAvailableNow(
        spark, landing, static, out, ckpt, schema)
        .awaitTermination(120000)

    // batch 1: the known bigram + a one-token doc (no bigrams -> no row)
    Seq((11L, "a b"), (12L, "solo")).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    run()
    val first = spark.read.parquet(out)
      .select("doc_id", "ppl", "n").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(first === Map(11L -> ((584963L, 1L))),
      s"hand-computed micro-bits must stream exactly; sub-bigram drops: $first")

    // batch 2 (restart): an unseen-prefix bigram pays L(V) = L(2) = 1e6;
    // batch-1 files must not reprocess
    Seq((13L, "q z")).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    run()
    val all = spark.read.parquet(out).collect()
    assert(all.length === 2, "restart must not reprocess batch-1 files")
    val p13 = all.filter(_.getLong(0) == 13L).head
    assert(p13.getLong(1) === 1000000L && p13.getLong(2) === 1L,
      s"unseen bigram must pay exactly log2(V) = 1 bit: $p13")
  }

  test("streamed delta scores equal the batch tier on the same frame") {
    val landing = Files.createTempDirectory("graft-ppl2-landing").toString
    val out = Files.createTempDirectory("graft-ppl2-out").toString
    val ckpt = Files.createTempDirectory("graft-ppl2-ckpt").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val train = docs.where(col("doc_id") % 2 === 0)
    val delta = docs.where(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
    delta.write.mode("append").parquet(landing)
    StreamingPerplexityScore.scoreAvailableNow(
      spark, landing, train, out, ckpt, schema)
      .awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select("doc_id", "ppl", "n").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = VocabModelOps.bigramPerplexityPerDoc(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed === batch, "continuous path drifted from the batch tier")
    assert(streamed.nonEmpty)
  }
}
