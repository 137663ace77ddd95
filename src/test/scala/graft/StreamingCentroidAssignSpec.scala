package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.streaming.StreamingCentroidAssign

/** Stream-static centroid assignment (q307's component): micro-batches
  * of new vectors score against the static corpus's rational centroids
  * with the batch tier's exact arithmetic, landing files are processed
  * exactly once across restarts via the checkpoint, and per-batch cost
  * never touches the corpus (broadcast centroid relation).
  */
class StreamingCentroidAssignSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  test("micro-batches assign to the nearest static centroid across restarts") {
    val landing = Files.createTempDirectory("graft-ca-landing").toString
    val out = Files.createTempDirectory("graft-ca-out").toString
    val ckpt = Files.createTempDirectory("graft-ca-ckpt").toString
    val corpus = Seq(
      (1L, 0, Seq(0.0, 0.0, 0.0, 0.0)),
      (2L, 0, Seq(0.002, 0.0, 0.0, 0.0)),
      (3L, 1, Seq(10.0, 10.0, 10.0, 10.0)),
      (4L, 1, Seq(10.002, 10.0, 10.0, 10.0)))
      .toDF("vec_id", "label", "embedding")

    def run(): Unit =
      StreamingCentroidAssign.assignAvailableNow(
        spark, landing, corpus, out, ckpt, schema)
        .awaitTermination(120000)

    // batch 1: one vector near each blob
    Seq((11L, Seq(0.001, 0.0, 0.0, 0.0)), (12L, Seq(9.9, 10.0, 10.0, 10.0)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(landing)
    run()
    val first = spark.read.parquet(out)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(first === Map(11L -> 0, 12L -> 1), s"batch-1 assignments: $first")

    // batch 2 (restart): two more vectors; batch-1 files must not
    // reprocess (exactly-once via the checkpoint)
    Seq((13L, Seq(10.1, 10.0, 10.0, 10.0)), (14L, Seq(0.1, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(landing)
    run()
    val all = spark.read.parquet(out)
    assert(all.count() === 4, "restart must not reprocess batch-1 files")
    val second = all.where(all("vec_id") >= 13L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(second === Map(13L -> 1, 14L -> 0), s"batch-2 assignments: $second")
  }

  test("streamed assignments equal the batch-tier scoring on the same frame") {
    import org.apache.spark.sql.functions._
    val landing = Files.createTempDirectory("graft-ca2-landing").toString
    val out = Files.createTempDirectory("graft-ca2-out").toString
    val ckpt = Files.createTempDirectory("graft-ca2-ckpt").toString
    // static corpus from the real table's q233 split
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val static = emb.where(col("vec_id") % 5 =!= 0)
    val delta = emb.where(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding"))
    delta.write.mode("append").parquet(landing)
    StreamingCentroidAssign.assignAvailableNow(
      spark, landing, static,
      out, ckpt,
      StructType.fromDDL("vec_id BIGINT, embedding ARRAY<FLOAT>"))
      .awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select(col("vec_id"), col("cl")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val x = graft.ops.EmbedStatsOps.quantElems(emb)
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
    val batch = graft.ops.EmbedStatsOps.assignToCentroids(
        graft.ops.EmbedStatsOps.quantElems(delta),
        graft.ops.EmbedStatsOps.ratCentroids(
          x.where(col("vec_id") % 5 =!= 0)))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed === batch,
      "continuous and batch assignment must agree vector-for-vector")
  }
}
