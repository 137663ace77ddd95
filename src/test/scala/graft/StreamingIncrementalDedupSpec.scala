package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamingIncrementalDedup

/** Stream-static incremental dedup: micro-batches are flagged against the
  * static corpus only (one-sided, like the batch tier), landing files are
  * processed exactly once across restarts via the checkpoint, and the
  * per-batch cost never touches corpus text (precomputed bucket relation).
  */
class StreamingIncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private val base =
    "the quick brown fox jumps over the lazy dog while the spark engine " +
      "shuffles partitions across the cluster and aggregates the results " +
      "then writes compressed columnar files to object storage where the " +
      "next stage of the pipeline reads them back prunes the columns it " +
      "needs and joins against the broadcast dimension tables"
  private val other =
    "completely different content about databases query planners join " +
      "ordering cost models statistics histograms cardinality estimation " +
      "vectorized execution morsels and adaptive scheduling"
  private val novel =
    "completely novel text about orchestrating container fleets " +
      "schedulers bin packing preemption quotas and autoscaling loops " +
      "that shares no shingles with anything in the existing corpus"

  test("micro-batches flag against the static corpus across restarts") {
    val landing = Files.createTempDirectory("graft-incr-landing").toString
    val out = Files.createTempDirectory("graft-incr-out").toString
    val ckpt = Files.createTempDirectory("graft-incr-ckpt").toString
    val corpus = Seq((1L, base), (2L, other)).toDF("doc_id", "text")

    def run(): Unit =
      StreamingIncrementalDedup.flagAvailableNow(
        spark, landing, corpus, out, ckpt, schema)
        .awaitTermination(120000)

    // batch 1: an exact dup of corpus doc 1, and a novel doc
    Seq((11L, base), (12L, novel)).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    run()
    val first = spark.read.parquet(out)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(first.size == 2)
    assert(first(11L).contains(1L), "exact dup of static corpus must flag")
    assert(first(12L).isEmpty, "novel doc must not flag")

    // batch 2 (restart): a near-dup of corpus doc 2, plus a repeat of the
    // NOVEL stream doc — one-sided contract: within-stream dups across
    // batches are not corpus matches and must stay unflagged
    Seq((13L, other.replace("adaptive", "dynamic")), (14L, novel))
      .toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    run()
    val all = spark.read.parquet(out)
    assert(all.count() == 4, "restart must not reprocess batch-1 files")
    val second = all.where(col("doc_id") >= 13L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(second(13L).contains(2L), "near-dup of static corpus must flag")
    assert(second(14L).isEmpty, "within-stream dup must not flag (one-sided)")
  }
}
