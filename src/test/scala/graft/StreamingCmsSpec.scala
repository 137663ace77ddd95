package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.SketchOps
import graft.streaming.StreamingCms
import graft.streaming.StreamingCms.{CellDelta, CellTotal}

/** The streaming sketch must agree with the batch sketch EXACTLY:
  * folding micro-batches is the CMS additive-merge law, so the
  * stream-maintained cells after replaying the corpus equal
  * SketchOps.cmsBuild over the same corpus cell-for-cell, and state is
  * bounded by depth*width keys however many distinct terms arrive.
  */
class StreamingCmsSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 32

  test("stream-folded cells equal the batch sketch cell-for-cell") {
    val landing = Files.createTempDirectory("graft-cms-in").toString
    val out = Files.createTempDirectory("graft-cms-out").toString
    val ckpt = Files.createTempDirectory("graft-cms-ckpt").toString

    val all = spark.read.parquet(s"$sf/documents.parquet")
    val docs = all.select(col("text")).as[String]
    // split the corpus into two landed batches BY KEY (an except() split
    // would dedup repeated texts and break multiplicity parity)
    val a = all.where(col("doc_id") % 2 === 0).select(col("text")).as[String]
    val b = all.where(col("doc_id") % 2 === 1).select(col("text")).as[String]
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("row INT, cell LONG, n LONG")
        .parquet(landing)
        .as[CellDelta]
      val q = StreamingCms.foldCells(stream)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[CellTotal], _: Long) =>
          batch.write.mode("append").parquet(out); ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "streaming run timed out")
    }
    StreamingCms.cellDeltas(a, depth, width)
      .toDF().write.mode("append").parquet(landing)
    runOnce()
    StreamingCms.cellDeltas(b, depth, width)
      .toDF().write.mode("append").parquet(landing)
    runOnce()

    // latest emission per cell wins (totals are monotone)
    val streamed = spark.read.parquet(out).as[CellTotal].collect()
      .groupBy(t => (t.row, t.cell))
      .map { case (k, ts) => k -> ts.map(_.total).max }
    val terms = docs.where(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("term"))
      .where(col("term") =!= "")
    val batch = SketchOps.cmsBuild(terms.toDF(), depth, width).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
    // state/emission cardinality bounded by construction
    assert(streamed.size <= depth * width)
  }
}
