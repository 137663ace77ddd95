package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.streaming.StreamingBudgetAdmission

/** Stateful token-budget admission (q338's component): the skip-fold
  * semantics (a rejected document consumes nothing — NOT a prefix-sum
  * window), quota state persisting across restarts with exactly-once
  * file processing, and stream == reference fold on the corpus.
  */
class StreamingBudgetAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private val schema =
    StructType.fromDDL("doc_id BIGINT, lang STRING, text STRING")

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("skip-fold admits after a rejection; quota survives restarts") {
    val landing = Files.createTempDirectory("graft-adm-landing").toString
    val out = Files.createTempDirectory("graft-adm-out").toString
    val ckpt = Files.createTempDirectory("graft-adm-ckpt").toString
    val budgets = Seq(("en", 10L)).toDF("lang", "budget")

    def run(): Unit =
      StreamingBudgetAdmission.admitAvailableNow(
        spark, landing, budgets, out, ckpt, schema)
        .awaitTermination(120000)

    // batch 1: 6 tokens admit (spent 6), 5 tokens reject (11 > 10)
    Seq((1L, "en", words(6)), (2L, "en", words(5)))
      .toDF("doc_id", "lang", "text")
      .write.mode("append").parquet(landing)
    run()
    // batch 2 AFTER RESTART: 3 tokens must still fit (6 + 3 <= 10) —
    // a prefix-sum would have charged the rejected 5 and refused it,
    // and a state loss would have reset spent to 0
    Seq((3L, "en", words(3))).toDF("doc_id", "lang", "text")
      .write.mode("append").parquet(landing)
    run()
    val got = spark.read.parquet(out)
      .select("doc_id", "admitted").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true),
      s"skip-fold admission verdicts drifted: $got")
    assert(spark.read.parquet(out).count() === 3,
      "restart must not reprocess batch-1 files")
    // and the quota is actually exhausted now: a 2-token doc (9+2>10)
    Seq((4L, "en", words(2))).toDF("doc_id", "lang", "text")
      .write.mode("append").parquet(landing)
    run()
    val v4 = spark.read.parquet(out).where(col("doc_id") === 4L)
      .select("admitted").collect().head.getBoolean(0)
    assert(!v4, "9 spent + 2 must overflow the 10-token quota")
  }

  test("streamed verdicts equal the reference doc_id-ordered fold") {
    val landing = Files.createTempDirectory("graft-adm2-landing").toString
    val out = Files.createTempDirectory("graft-adm2-out").toString
    val ckpt = Files.createTempDirectory("graft-adm2-ckpt").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val nt = expr(
      "CAST(size(filter(split(coalesce(text, ''), ' '), t -> t <> '')) AS BIGINT)")
    val budgets = docs.select(col("lang"), nt.as("n"))
      .groupBy("lang").agg(expr("sum(n) div 2").as("budget"))
    docs.write.mode("append").parquet(landing)
    StreamingBudgetAdmission.admitAvailableNow(
      spark, landing, budgets, out, ckpt, schema)
      .awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select("doc_id", "admitted").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // reference: a plain Scala fold per language in doc_id order
    val bMap = budgets.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = docs.select(col("doc_id"), col("lang"), nt.as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val spent = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val expect = rows.map { case (d, l, n) =>
      val ok = spent(l) + n <= bMap(l)
      if (ok) spent(l) += n
      d -> ok
    }.toMap
    assert(streamed === expect, "continuous fold drifted from the reference")
    assert(streamed.values.exists(_ == false),
      "fixture must actually exhaust at least one quota")
  }
}
