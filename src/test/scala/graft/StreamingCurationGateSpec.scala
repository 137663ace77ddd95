package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.streaming.StreamingCurationGate

/** Chained curation gate (q344's component): gated docs consume no
  * budget, passing docs run the q338 skip-fold, quota state survives
  * restarts, and the whole chain equals the reference fold.
  */
class StreamingCurationGateSpec extends SparkSpec {
  import spark.implicits._

  private val schema =
    StructType.fromDDL("doc_id BIGINT, lang STRING, text STRING")

  private def words(n: Int): String =
    (1 to n).map(i => s"word$i").mkString(" ")

  test("gate rejects without consuming; budget state survives restarts") {
    val landing = Files.createTempDirectory("graft-gate-landing").toString
    val out = Files.createTempDirectory("graft-gate-out").toString
    val ckpt = Files.createTempDirectory("graft-gate-ckpt").toString
    val budgets = Seq(("en", 45L)).toDF("lang", "budget")

    def run(): Unit =
      StreamingCurationGate.gateAvailableNow(
        spark, landing, budgets, out, ckpt, schema)
        .awaitTermination(120000)

    // batch 1: a 20-word passing doc (admit, spent 20) and a 2-word doc
    // (gated by the word-count rule — must consume NOTHING)
    Seq((1L, "en", words(20)), (2L, "en", "x y"))
      .toDF("doc_id", "lang", "text")
      .write.mode("append").parquet(landing)
    run()
    // batch 2 AFTER RESTART: 25 words fit EXACTLY iff the gated doc
    // consumed nothing and the restart kept spent = 20 (20 + 25 = 45);
    // then a further 20-word doc must overflow
    Seq((3L, "en", words(25)), (4L, "en", words(20)))
      .toDF("doc_id", "lang", "text")
      .write.mode("append").parquet(landing)
    run()
    val got = spark.read.parquet(out)
      .select("doc_id", "gated", "admitted").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(got === Map(
      1L -> ((false, true)), 2L -> ((true, false)),
      3L -> ((false, true)), 4L -> ((false, false))),
      s"gate/admission verdicts drifted: $got")
    assert(spark.read.parquet(out).count() === 4,
      "restart must not reprocess batch-1 files")
  }

  test("streamed chain equals the reference gate + fold on the corpus") {
    val landing = Files.createTempDirectory("graft-gate2-landing").toString
    val out = Files.createTempDirectory("graft-gate2-out").toString
    val ckpt = Files.createTempDirectory("graft-gate2-ckpt").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val gf = StreamingCurationGate.gateFrame(docs)
    val budgets = gf.where(!col("gated"))
      .groupBy("lang").agg(expr("sum(n_toks) div 2").as("budget"))
    docs.write.mode("append").parquet(landing)
    StreamingCurationGate.gateAvailableNow(
      spark, landing, budgets, out, ckpt, schema)
      .awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select("doc_id", "gated", "admitted").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    val bMap = budgets.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = gf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    val spent = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val expect = rows.map { case (d, l, n, gated) =>
      if (gated) d -> ((true, false))
      else {
        val ok = spent(l) + n <= bMap(l)
        if (ok) spent(l) += n
        d -> ((false, ok))
      }
    }.toMap
    assert(streamed === expect, "continuous chain drifted from the reference")
    assert(streamed.values.exists(_._1), "fixture must gate something")
    assert(streamed.values.exists(v => !v._1 && !v._2),
      "fixture must exhaust at least one quota")
  }
}
