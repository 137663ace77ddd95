package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingTopK

/** Per-segment streaming bounded top-k (q318's component): the
  * leaderboard folds incrementally with the batch aggregate's own
  * BoundedTopK arithmetic, state stays k entries per segment (evicted
  * items never resurface), landing order cannot change the final
  * result, and files process exactly once across restarts.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private val rocks = "spark.sql.streaming.stateStore.providerClass"

  private def withRocks[T](body: => T): T = {
    val prev = spark.conf.getOption(rocks)
    spark.conf.set(rocks,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(rocks, v)
      case None => spark.conf.unset(rocks)
    }
  }

  private def runOnce(landing: String, out: String, ckpt: String): Unit =
    withRocks {
      val stream = spark.readStream
        .schema("segment STRING, cents LONG, o_orderkey LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .as[StreamingTopK.OrderRow]
      StreamingTopK.topkPerSegment(stream, k = 3)
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingTopK.TopKRows], id: Long) =>
            b.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(out)
            ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(StreamingTopK.outputMode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(120000)
      ()
    }

  private def finalBoard(out: String): Map[String, Seq[(Long, Long)]] =
    spark.read.parquet(out)
      .groupBy("segment")
      .agg(expr("max_by(struct(values, ids), batch_id)").as("s"))
      .collect()
      .map(r => r.getString(0) -> {
        val s = r.getStruct(1)
        s.getAs[scala.collection.Seq[Long]](0).toSeq
          .zip(s.getAs[scala.collection.Seq[Long]](1).toSeq)
      }).toMap

  test("evicted items never resurface; restarts are exactly-once") {
    val landing = Files.createTempDirectory("graft-tk-landing").toString
    val out = Files.createTempDirectory("graft-tk-out").toString
    val ckpt = Files.createTempDirectory("graft-tk-ckpt").toString
    // batch 1: board fills with 900/800/700
    Seq(("A", 900L, 1L), ("A", 800L, 2L), ("A", 700L, 3L))
      .toDF("segment", "cents", "o_orderkey")
      .write.mode("append").parquet(landing)
    runOnce(landing, out, ckpt)
    assert(finalBoard(out)("A") === Seq((900L, 1L), (800L, 2L), (700L, 3L)))
    // batch 2 (restart): all below the board — state must not change,
    // and batch-1 files must not reprocess
    Seq(("A", 100L, 4L), ("A", 200L, 5L))
      .toDF("segment", "cents", "o_orderkey")
      .write.mode("append").parquet(landing)
    runOnce(landing, out, ckpt)
    assert(finalBoard(out)("A") === Seq((900L, 1L), (800L, 2L), (700L, 3L)),
      "sub-board arrivals must not disturb the leaderboard")
    // batch 3: a new maximum enters at rank 1, 700 evicts for good
    Seq(("A", 950L, 6L)).toDF("segment", "cents", "o_orderkey")
      .write.mode("append").parquet(landing)
    runOnce(landing, out, ckpt)
    assert(finalBoard(out)("A") === Seq((950L, 6L), (900L, 1L), (800L, 2L)))
  }

  test("landing order cannot change the final board (commutative fold)") {
    val rows = (1L to 40L).map(i => ("S", (i * 37) % 100 * 10, i))
    def run(batches: Seq[Seq[(String, Long, Long)]]): Map[String, Seq[(Long, Long)]] = {
      val landing = Files.createTempDirectory("graft-tk2-landing").toString
      val out = Files.createTempDirectory("graft-tk2-out").toString
      val ckpt = Files.createTempDirectory("graft-tk2-ckpt").toString
      batches.foreach(_.toDF("segment", "cents", "o_orderkey")
        .write.mode("append").parquet(landing))
      runOnce(landing, out, ckpt)
      finalBoard(out)
    }
    val ascending = run(rows.sortBy(_._2).grouped(10).toSeq)
    val descending = run(rows.sortBy(-_._2).grouped(10).toSeq)
    assert(ascending === descending,
      "adversarial landing order changed the leaderboard")
    // and both equal the batch aggregate's board
    val batchTop = graft.ops.WarehouseOps.topOrdersPerSegment(
      rows.toDF("segment", "cents", "o_orderkey")
        .select(col("o_orderkey"), lit(1L).as("o_custkey"),
          (col("cents").cast("double") / 100).as("o_totalprice")),
      Seq((1L, "S")).toDF("c_custkey", "c_mktsegment"), k = 3)
      .collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(ascending("S") === batchTop,
      s"stream board drifted from the batch window: $batchTop")
  }
}
