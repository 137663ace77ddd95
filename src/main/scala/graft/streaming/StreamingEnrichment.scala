package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment join: a fact stream joined per micro-batch
  * against a static dimension snapshot — the streaming analogue of the
  * q45/q10 dim joins and the last unexercised join mode in the streaming
  * matrix (stream-stream interval join and stream-static DEDUP already
  * exist). The static side is re-planned into every micro-batch, so a
  * dimension small enough to broadcast in batch broadcasts here too —
  * no state store is involved at all (unlike stream-stream joins), which
  * is what makes this shape safe at any stream rate: per-batch cost is
  * the batch-join cost of that micro-batch alone.
  *
  * Maps the reference's enrichment surface (category analytics,
  * 02:61-96) onto a live stream; extends the SURVEY §7.4 streaming
  * matrix.
  */
object StreamingEnrichment {

  /** Enrich a stream of sales rows with a static (category →
    * macro_category) dimension. A plain inner equi-join; Catalyst
    * broadcasts the static side inside each micro-batch plan (asserted
    * in the spec).
    */
  def enrich(stream: DataFrame, dim: DataFrame): DataFrame =
    stream.join(broadcast(dim), Seq("category"))

  /** Batch reference for parity checks: the same join on a static frame. */
  def enrichBatch(batch: DataFrame, dim: DataFrame): DataFrame =
    batch.join(broadcast(dim), Seq("category"))

  /** Per-macro-category revenue over the enriched stream — complete-mode
    * aggregate whose final answer must equal the batch group-by on the
    * same data (parity pinned in the spec). The money sum goes through
    * the exact decimal path like every batch revenue aggregate.
    */
  def macroRevenue(enriched: DataFrame): DataFrame =
    enriched.groupBy(col("macro_category"))
      .agg(round(sum((col("quantity") * col("price"))
        .cast(org.apache.spark.sql.types.DecimalType(18, 4))), 2)
        .cast("double").as("revenue"))
}
