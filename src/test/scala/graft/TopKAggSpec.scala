package graft

import org.apache.spark.sql.functions._

import graft.functions.{BoundedTopK, RankedItem, TopKAggregate, TopKState}
import graft.ops.WarehouseOps

/** Pins for the bounded top-k aggregate: buffer-level algebra (bound,
  * totality, merge associativity), partitioning-independence of the
  * Spark plan, parity with the window formulation, and the plan shape
  * that justifies its existence (partial ObjectHashAggregate before the
  * exchange).
  */
class TopKAggSpec extends SparkSpec {

  private val agg = BoundedTopK(3)

  private def state(pairs: (Long, Long)*): TopKState =
    pairs.foldLeft(agg.zero)((b, p) => agg.reduce(b, RankedItem(p._1, p._2)))

  test("reduce keeps the buffer sorted by (value desc, id asc) and bounded at k") {
    val s = state(5L -> 50L, 9L -> 90L, 7L -> 70L, 9L -> 10L, 1L -> 11L, 8L -> 80L)
    assert(s.values.toSeq === Seq(9L, 9L, 8L))
    assert(s.ids.toSeq === Seq(10L, 90L, 80L))
  }

  test("a no-op candidate below the current floor returns the buffer unchanged") {
    val s = state(9L -> 1L, 8L -> 2L, 7L -> 3L)
    assert(agg.reduce(s, RankedItem(6L, 4L)) eq s)
  }

  test("merge equals reducing the concatenation, in any grouping") {
    val xs = Seq(5L -> 50L, 9L -> 90L, 7L -> 70L, 9L -> 10L, 1L -> 11L,
      8L -> 80L, 3L -> 30L, 9L -> 95L)
    val direct = state(xs: _*)
    for (cut <- 0 to xs.length) {
      val (a, b) = xs.splitAt(cut)
      val m = agg.merge(state(a: _*), state(b: _*))
      assert(m.values.toSeq === direct.values.toSeq, s"cut=$cut")
      assert(m.ids.toSeq === direct.ids.toSeq, s"cut=$cut")
    }
  }

  test("q187 equals the window row_number formulation and is partitioning-independent") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val viaAgg = WarehouseOps.topOrdersPerSegment(o, c, k = 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("segment").orderBy(col("cents").desc, col("o_orderkey").asc)
    val viaWindow = o.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .where(col("rnk") <= 5)
      .select("segment", "rnk", "cents", "o_orderkey")
    assert(viaAgg.collect().toSeq === viaWindow.orderBy("segment", "rnk").collect().toSeq)
    val reparted = WarehouseOps.topOrdersPerSegment(
      o.repartition(7, col("o_orderkey")), c, k = 5)
    assert(reparted.collect().toSeq === viaAgg.collect().toSeq)
  }

  test("the aggregate plans a partial ObjectHashAggregate below the exchange") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val grouped = o.select(lit("g").as("g"),
        col("o_orderkey").as("id"), round(col("o_totalprice") * 100).cast("long").as("v"))
      .groupBy("g")
      .agg(TopKAggregate.topK(5)(col("v"), col("id")).as("top"))
    val plan = grouped.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate pair in:\n$plan")
    assert(plan.contains("partial_boundedtopk") || plan.toLowerCase.contains("partial"),
      s"expected a partial-mode aggregate in:\n$plan")
  }
}
