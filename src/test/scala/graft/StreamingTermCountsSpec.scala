package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingTermCounts
import graft.streaming.StreamingTermCounts.{TermDelta, TermTotal}

/** Grades the streaming term counter by exact parity with the batch word
  * count (replay totals must be EQUAL, not approximate), pins the
  * cross-run state carry, and checks update-mode re-emission semantics
  * (latest row per term wins).
  */
class StreamingTermCountsSpec extends SparkSpec {
  import spark.implicits._

  test("batch-mode fold equals the plain word count on the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val texts = docs.select(col("text")).as[String]
    val folded = StreamingTermCounts.countTerms(
        StreamingTermCounts.tokenDeltas(texts))
      .collect().map(t => t.term -> t.total).toMap
    val batch = docs.where(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("term"))
      .where(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folded === batch)
  }

  test("totals accumulate across runs through the state store; latest emission wins") {
    val landing = Files.createTempDirectory("graft-terms-in").toString
    val out = Files.createTempDirectory("graft-terms-out").toString
    val ckpt = Files.createTempDirectory("graft-terms-ckpt").toString

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("term STRING, n LONG")
        .parquet(landing)
        .as[TermDelta]
      // the parquet sink is append-only, so update-mode emissions land
      // through foreachBatch — exactly the serving-table shape
      // StreamingUpsert implements for real
      val q = StreamingTermCounts.countTerms(stream)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[TermTotal], _: Long) =>
          batch.write.mode("append").parquet(out); ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    Seq(TermDelta("alpha", 2L), TermDelta("beta", 1L))
      .toDF().write.mode("append").parquet(landing)
    runOnce()
    Seq(TermDelta("alpha", 3L), TermDelta("gamma", 5L))
      .toDF().write.mode("append").parquet(landing)
    runOnce()

    val rows = spark.read.parquet(out).as[(String, Long)].collect()
    // update mode re-emits alpha once per touching batch: the row with
    // the HIGHER total is the later one (totals are monotone — that, not
    // batch_seq, is the ordering contract)
    val latest = rows.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(_._2).max
    }
    assert(latest === Map("alpha" -> 5L, "beta" -> 1L, "gamma" -> 5L))
    assert(rows.count(_._1 == "alpha") == 2, "alpha must emit in both runs")
    assert(rows.count(_._1 == "beta") == 1, "untouched terms must NOT re-emit")
  }

  test("top-k over the folded totals matches the batch top-k with ties broken") {
    val texts = Seq("a a a b b c", "b a d", null).toDS()
    val totals = StreamingTermCounts.countTerms(
        StreamingTermCounts.tokenDeltas(texts))
      .collect().sortBy(t => (-t.total, t.term)).take(3).toSeq
    assert(totals === Seq(TermTotal("a", 4L), TermTotal("b", 3L),
      TermTotal("c", 1L)))
  }
}
