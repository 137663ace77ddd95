package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.gen.SalesGen
import graft.model.Sales
import graft.streaming.StreamingEnrichment

/** Stream-static enrichment: per-micro-batch dimension join with no state
  * store — batch parity on both the enriched rows and the aggregated
  * revenue, and the static side broadcasts inside the micro-batch plan.
  */
class StreamingEnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private def dim =
    Sales.categories.map {
      case c @ ("Elettronica") => (c, "Tech")
      case c @ ("Abbigliamento" | "Sport") => (c, "Lifestyle")
      case c => (c, "Altro")
    }.toDF("category", "macro_category")

  test("stream-static join matches the batch join and broadcasts the dim") {
    implicit val sqlCtx = spark.sqlContext
    val sales = SalesGen.initialBatch(spark, n = 60, seed = 7L).toDF()
    val rows = sales.as[graft.model.BronzeOrder].collect().toSeq

    val input = MemoryStream[graft.model.BronzeOrder]
    val enriched = StreamingEnrichment.enrich(input.toDF(), dim)
    val agg = StreamingEnrichment.macroRevenue(enriched)
    val q = agg.writeStream.format("memory")
      .queryName("enrich_out").outputMode("complete").start()
    try {
      // two micro-batches: the static side must join in BOTH
      input.addData(rows.take(25))
      q.processAllAvailable()
      input.addData(rows.drop(25))
      q.processAllAvailable()

      val streamed = spark.table("enrich_out")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val batch = StreamingEnrichment.macroRevenue(
          StreamingEnrichment.enrichBatch(sales, dim))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(streamed == batch,
        s"complete-mode aggregate must equal batch group-by: $streamed vs $batch")
      assert(batch.keySet == Set("Tech", "Lifestyle", "Altro"))

      // the only stateful operator is the complete-mode AGGREGATE — the
      // stream-static join itself must not add one
      assert(q.lastProgress.stateOperators.length == 1,
        "only the aggregation may hold state, never the dim join")
      val batchPlan = StreamingEnrichment
        .enrichBatch(sales, dim).queryExecution.executedPlan.toString
      assert(batchPlan.contains("BroadcastHashJoin"),
        s"dim side must broadcast:\n$batchPlan")
    } finally q.stop()
  }

  test("no-match stream rows drop out like the batch inner join") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[graft.model.BronzeOrder]
    val smallDim = Seq(("Elettronica", "Tech")).toDF("category", "macro_category")
    val q = StreamingEnrichment.enrich(input.toDF(), smallDim)
      .writeStream.format("memory").queryName("enrich_inner")
      .outputMode("append").start()
    try {
      val rows = SalesGen.initialBatch(spark, n = 40, seed = 9L).toDF()
        .as[graft.model.BronzeOrder].collect().toSeq
      input.addData(rows)
      q.processAllAvailable()
      val got = spark.table("enrich_inner").select("category").distinct()
        .as[String].collect().toSet
      assert(got == Set("Elettronica"),
        s"inner join keeps only matching categories, got $got")
      // a pure stream-static join is stateless end to end
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join must not allocate a state store")
    } finally q.stop()
  }
}
