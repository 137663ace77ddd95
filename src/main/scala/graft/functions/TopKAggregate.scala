package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One (value, id) candidate for the bounded top-k buffer. */
final case class RankedItem(value: Long, id: Long)

/** Bounded top-k state: parallel arrays sorted by (value desc, id asc),
  * never longer than k. Arrays (not a Seq of tuples) keep the buffer a
  * flat codegen-friendly struct of two long arrays.
  */
final case class TopKState(values: Array[Long], ids: Array[Long])

/** Per-group top-k as a TypedImperativeAggregate (via Aggregator+udaf),
  * NOT a window sort: the buffer holds at most k elements, so the
  * map-side partial pass trims every partition's contribution to k rows
  * per group BEFORE the shuffle — the exchange moves O(groups × k ×
  * partitions) fixed-size state instead of the whole fact table, and no
  * per-group sort ever materializes. This is the plan shape that makes
  * "top 5 orders per segment" survive a 100 TB fact scan where the
  * `row_number().over(partitionBy(segment))` formulation sorts the full
  * fact table inside 5 giant hash partitions. Ordering is total —
  * (value desc, id asc) — so results are deterministic under any
  * partitioning and merge order (merge is a two-pointer merge of two
  * sorted bounded buffers, associative and commutative by totality).
  */
final case class BoundedTopK(k: Int)
    extends Aggregator[RankedItem, TopKState, TopKState] {
  require(k > 0, s"top-k bound must be positive, got $k")

  override def zero: TopKState = TopKState(Array.empty, Array.empty)

  /** true when (v1, id1) ranks strictly ahead of (v2, id2). */
  @inline private def ahead(v1: Long, id1: Long, v2: Long, id2: Long): Boolean =
    v1 > v2 || (v1 == v2 && id1 < id2)

  override def reduce(b: TopKState, a: RankedItem): TopKState = {
    val n = b.values.length
    if (n == k && !ahead(a.value, a.id, b.values(n - 1), b.ids(n - 1))) b
    else {
      // insertion point in the sorted prefix
      var i = 0
      while (i < n && ahead(b.values(i), b.ids(i), a.value, a.id)) i += 1
      val m = math.min(n + 1, k)
      val vs = new Array[Long](m)
      val is = new Array[Long](m)
      System.arraycopy(b.values, 0, vs, 0, i)
      System.arraycopy(b.ids, 0, is, 0, i)
      vs(i) = a.value
      is(i) = a.id
      val tail = m - i - 1
      if (tail > 0) {
        System.arraycopy(b.values, i, vs, i + 1, tail)
        System.arraycopy(b.ids, i, is, i + 1, tail)
      }
      TopKState(vs, is)
    }
  }

  override def merge(x: TopKState, y: TopKState): TopKState = {
    val m = math.min(x.values.length + y.values.length, k)
    val vs = new Array[Long](m)
    val is = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeX = j >= y.values.length ||
        (i < x.values.length && ahead(x.values(i), x.ids(i), y.values(j), y.ids(j)))
      if (takeX) { vs(o) = x.values(i); is(o) = x.ids(i); i += 1 }
      else { vs(o) = y.values(j); is(o) = y.ids(j); j += 1 }
      o += 1
    }
    TopKState(vs, is)
  }

  override def finish(b: TopKState): TopKState = b

  override def bufferEncoder = Encoders.product[TopKState]
  override def outputEncoder = Encoders.product[TopKState]
}

object TopKAggregate {

  /** Column-callable form: `topK(5)(col("cents"), col("o_orderkey"))`
    * returns a struct{values, ids} of the group's top 5 by value.
    */
  def topK(k: Int): UserDefinedFunction =
    udaf(BoundedTopK(k), Encoders.product[RankedItem])
}
