package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.streaming.StreamingMinHashDedup

/** Stateful streaming near-dup dedup (q310's component): per-bucket
  * GroupState remembers the earliest member across micro-batches and
  * restarts, within-batch arrivals resolve by sorted order, and under
  * id-ordered delivery the assignment equals the batch 1-hop tier.
  */
class StreamingMinHashDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private val base =
    "the quick brown fox jumps over the lazy dog while the spark engine " +
      "shuffles partitions across the cluster and aggregates the results " +
      "then writes compressed columnar files to object storage"
  private val other =
    "completely different content about databases query planners join " +
      "ordering cost models statistics histograms cardinality estimation"
  private val third =
    "a third unrelated passage describing container fleets schedulers " +
      "bin packing preemption quotas and autoscaling control loops"

  test("bucket state persists across micro-batches and restarts") {
    val landing = Files.createTempDirectory("graft-smh-landing").toString
    val out = Files.createTempDirectory("graft-smh-out").toString
    val ckpt = Files.createTempDirectory("graft-smh-ckpt").toString

    def run(): Unit =
      StreamingMinHashDedup.dedupAvailableNow(
        spark, landing, out, ckpt, schema)
        .awaitTermination(120000)

    // batch 1: two distinct docs — both canonical = self
    Seq((1L, base), (2L, other)).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    run()
    val first = spark.read.parquet(out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first === Map(1L -> 1L, 2L -> 2L), s"batch 1: $first")

    // batch 2 (restart): a dup of doc 1 must flag AGAINST STATE, a
    // within-batch pair must resolve to its smaller member
    Seq((11L, base), (21L, third), (22L, third)).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    run()
    val all = spark.read.parquet(out)
    assert(all.count() === 5, "restart must not reprocess batch-1 files")
    val second = all.where(all("doc_id") >= 11L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(second === Map(11L -> 1L, 21L -> 21L, 22L -> 21L),
      s"batch 2: $second")
  }

  test("id-ordered replay equals the batch 1-hop assignment on the corpus") {
    val replayed = graft.ops.StreamReplayOps.minhashDedupReplay(spark, sf)
      .collect().toSeq
    val batch = graft.ops.DedupOps.minhashAssign(
        spark.read.parquet(s"$sf/documents.parquet")).collect().toSeq
    assert(replayed === batch,
      "continuous per-bucket state and the batch window must agree")
  }
}
