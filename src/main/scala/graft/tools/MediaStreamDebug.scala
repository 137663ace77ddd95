package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.ops.TakedownOps

/** Scratch: instrument the streamed media fold to see why batches drop. */
object MediaStreamDebug {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.util.Tables.t(spark, sf, "documents")
      .select(col("doc_id"))
    val cut = docs.agg(expr("max(doc_id) * 4 div 5").as("t")).head()
      .getLong(0)
    val tn = TakedownOps.mediaTables("graft_mdbg")
    TakedownOps.mediaMaterialize(spark, docs.where(col("doc_id") <= cut),
      "graft_mdbg")
    println(s"base keyed=${spark.table(tn.keyed).count()} cut=$cut")
    val tail = docs.where(col("doc_id") > cut)
    val mid = docs.agg(expr("max(doc_id) * 9 div 10").as("t")).head()
      .getLong(0)
    val landing = Files.createTempDirectory("graft-mdbg-landing").toString
    tail.where(col("doc_id") <= mid).coalesce(1)
      .write.mode("append").parquet(landing)
    tail.where(col("doc_id") > mid).coalesce(1)
      .write.mode("append").parquet(landing)
    val q = spark.readStream
      .schema(StructType.fromDDL("doc_id BIGINT"))
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val wmRow = spark.table(tn.keyed).agg(max(col("doc_id"))).head()
        val wm = if (wmRow.isNullAt(0)) Long.MinValue else wmRow.getLong(0)
        val fresh = batch.where(col("doc_id") > wm).localCheckpoint(true)
        println(s"batch=$bid rows=${batch.count()} wm=$wm fresh=${fresh.count()}")
        if (!fresh.isEmpty) {
          try {
            TakedownOps.appendToMedia(spark, fresh, "graft_mdbg")
            println(s"batch=$bid appended ok; keyed now=" +
              spark.table(tn.keyed).count())
          } catch { case e: Throwable =>
            println(s"batch=$bid appendToMedia FAILED: $e")
            e.printStackTrace()
          }
          Seq(tn.keyed, tn.sigs, tn.clusters)
            .foreach(spark.catalog.refreshTable)
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-mdbg-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    println(s"final keyed=${spark.table(tn.keyed).count()}")
    spark.stop()
  }
}
