package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Misra-Gries summary state: at most k tracked items with residual
  * counts, plus the exact stream length. The map is the encoder-visible
  * immutable form; updates inside a partition touch one key at a time
  * (persistent-map update, no full copy), and the O(k) decrement sweep
  * runs only on overflow inserts.
  */
final case class MgState(counts: Map[String, Long], n: Long)

/** Finished summary: the candidate item set (sorted, ≤ k) and the exact
  * stream length N — everything the exact-recount second pass needs.
  */
final case class MgSummary(candidates: Seq[String], n_stream: Long)

/** Misra-Gries heavy-hitters sketch (Misra & Gries 1982) as a mergeable
  * typed Aggregator — the deterministic-guarantee counterpart to the
  * CMS (q229) and to Spark's approx_top_k (q83): with capacity k, every
  * item whose true frequency exceeds N/(k+1) is GUARANTEED to survive
  * in the candidate set, under any partitioning and any merge order.
  *
  * reduce is the classic step: increment a tracked item; insert if a
  * slot is free; otherwise decrement ALL k counters by one and discard
  * the arrival (k+1 units of mass removed — each item's undercount
  * grows by at most 1 per k+1 stream elements). merge is the mergeable-
  * summaries form (Agarwal et al. 2012, PODS): sum the two maps, and if
  * more than k items survive, subtract the (k+1)-th largest residual
  * from every count and drop the non-positive — the k+1 largest each
  * lose exactly d, so ≥ (k+1)·d mass is removed per unit of added
  * undercount, preserving the N/(k+1) bound additively across merges.
  * Both paths keep the invariant: undercount(t) ≤ (N − Σ residuals)
  * / (k+1) ≤ N/(k+1).
  *
  * The candidate SET depends on merge order (residual ties break
  * differently) — which is why the graded operator (SketchOps
  * .heavyHitters, q312) never emits it raw: an exact recount of the
  * candidates filters to true frequency > N/(k+1), and the guarantee
  * makes that intersection EXACTLY the true heavy-hitter set, fully
  * deterministic. The sketch buys the plan shape: the first pass moves
  * O(k) state per partition through the exchange instead of the
  * unbounded vocabulary, and the second pass shuffles only candidate
  * rows.
  */
final case class MisraGries(k: Int)
    extends Aggregator[String, MgState, MgSummary] {
  require(k >= 1, s"Misra-Gries capacity must be positive, got $k")

  override def zero: MgState = MgState(Map.empty, 0L)

  override def reduce(b: MgState, term: String): MgState = {
    val c = b.counts
    val next = c.get(term) match {
      case Some(v) => c.updated(term, v + 1L)
      case None if c.size < k => c.updated(term, 1L)
      case None =>
        // overflow: decrement every counter, drop the zeroed, discard
        // the arrival — k+1 units of mass leave the summary together
        c.collect { case (t, v) if v > 1L => t -> (v - 1L) }
    }
    MgState(next, b.n + 1L)
  }

  override def merge(a: MgState, b: MgState): MgState = {
    val (small, large) =
      if (a.counts.size <= b.counts.size) (a.counts, b.counts)
      else (b.counts, a.counts)
    val summed = small.foldLeft(large) { case (m, (t, v)) =>
      m.updated(t, m.getOrElse(t, 0L) + v)
    }
    val trimmed =
      if (summed.size <= k) summed
      else {
        // d = the (k+1)-th largest residual; strict > d keeps ≤ k items
        val d = summed.valuesIterator.toArray
          .sorted(Ordering[Long].reverse).apply(k)
        summed.collect { case (t, v) if v > d => t -> (v - d) }
      }
    MgState(trimmed, a.n + b.n)
  }

  override def finish(b: MgState): MgSummary =
    MgSummary(b.counts.keysIterator.toSeq.sorted, b.n)

  override def bufferEncoder = Encoders.product[MgState]

  override def outputEncoder = Encoders.product[MgSummary]
}

object MisraGries {

  /** Column-callable form: `misraGries(64)(col("term"))` returns a
    * struct{candidates, n_stream} summary of the group's term stream.
    */
  def misraGries(k: Int): UserDefinedFunction =
    udaf(MisraGries(k), Encoders.STRING)
}
