package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuously-maintained Count-Min sketch — the streaming face of
  * q229's bounded-relation CMS. StreamingTermCounts keeps one EXACT
  * counter per term (state grows with the vocabulary — Heaps-law
  * sublinear but unbounded); this keeps one counter per SKETCH CELL, so
  * state is bounded BY CONSTRUCTION at depth×width keys however many
  * distinct terms ever arrive — the heavy-hitters feed for a stream
  * whose key domain cannot be assumed bounded at all (URLs, user
  * agents, query strings).
  *
  * Each micro-batch collapses its tokens to per-(row, cell) deltas with
  * the SAME xxhash64(term, row) expression text as the batch sketch
  * (SketchOps.cmsBuild), so stream-fold and batch-build agree exactly:
  * the spec pins fold(batches) == build(union) cell-for-cell, which is
  * just the sketch's additive-merge law applied per micro-batch.
  * Update-mode: a cell re-emits only when a batch touches it; estimates
  * read MIN over the depth rows of the served cells (never undercount,
  * as in batch).
  */
object StreamingCms {

  /** Map-side pre-aggregated per-batch cell delta. */
  final case class CellDelta(row: Int, cell: Long, n: Long)

  /** Running cell total after folding the batch's delta. */
  final case class CellTotal(row: Int, cell: Long, total: Long)

  def update(key: (Int, Long), rows: Iterator[CellDelta],
      state: GroupState[Long]): CellTotal = {
    var add = 0L
    rows.foreach(r => add += r.n)
    val total = state.getOption.getOrElse(0L) + add
    state.update(total)
    CellTotal(key._1, key._2, total)
  }

  /** Fold per-cell deltas into running totals (update output mode).
    * State keys are at most depth×width (row, cell) pairs.
    */
  def foldCells(deltas: Dataset[CellDelta]): Dataset[CellTotal] = {
    import deltas.sparkSession.implicits._
    deltas.groupByKey(d => (d.row, d.cell))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** Tokenize a text column into unit (row, cell, 1) deltas with q229's
    * hash family. STATELESS by design (a groupBy here would be a second
    * stateful operator in front of mapGroupsWithState, which streaming
    * forbids — the StreamingTermCounts.tokenDeltas precedent): the
    * fold's per-group sum squashes the units, so state-store WRITES stay
    * one per touched cell per batch; only the shuffle carries the unit
    * rows.
    */
  def cellDeltas(texts: Dataset[String], depth: Int, width: Int): Dataset[CellDelta] = {
    import texts.sparkSession.implicits._
    require(depth > 0 && width > 0,
      s"depth/width must be positive, got $depth/$width")
    texts.toDF("text")
      .where(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("term"))
      .where(col("term") =!= "")
      .select(posexplode(expr(
        s"transform(sequence(0, ${depth - 1}), i -> pmod(xxhash64(term, i), $width))"))
        .as(Seq("row", "cell")))
      .select(col("row"), col("cell"), lit(1L).as("n"))
      .as[CellDelta]
  }

  /** Output mode required by the sink for [[foldCells]]. */
  val outputMode: OutputMode = OutputMode.Update()
}
