package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.GraphOps

/** Pins for the graph tier: edge derivation bounds, BFS minimality on a
  * hand-built graph with a shortcut, and the integer PageRank invariants
  * (cycle fixed point, exact hand-computed star ranks, mass bound).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame = {
    val e = pairs.toDF("src", "dst")
    e.withColumn("n_lines", lit(1L))
      .withColumn("outdeg",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
  }

  test("tradeEdges keeps at most k partners per source with outdeg attached") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val s = spark.read.parquet(s"$sf/supplier.parquet")
    val e = GraphOps.tradeEdges(o, l, c, s, k = 3).cache()
    val perSrc = e.groupBy("src")
      .agg(count(lit(1)).as("n"), max("outdeg").as("od"), min("outdeg").as("od2"))
      .collect()
    assert(perSrc.nonEmpty)
    perSrc.foreach { r =>
      assert(r.getAs[Long]("n") <= 3)
      assert(r.getAs[Long]("od") === r.getAs[Long]("n"))
      assert(r.getAs[Long]("od2") === r.getAs[Long]("n"))
    }
    e.unpersist()
  }

  test("bfsHops takes the shortcut, honors maxHops, and keeps min distance") {
    // chain 1->2->3->4->5->6 plus shortcut 1->4: dist(4)=1, dist(5)=2,
    // dist(6)=3; with maxHops=2 node 6 (and anything farther) is absent.
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 1L -> 4L)
    val d4 = GraphOps.bfsHops(e, source = 1L, maxHops = 4)
      .as[(Long, Int)].collect().toMap
    assert(d4 === Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2, 6L -> 3))
    val d2 = GraphOps.bfsHops(e, source = 1L, maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(d2 === Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
  }

  test("pageRank: a 2-cycle is a fixed point of the integer iteration") {
    val e = edges(1L -> 2L, 2L -> 1L)
    val r = GraphOps.pageRank(e, iterations = 5)
      .as[(Long, Long)].collect().toMap
    // each node redistributes (1e6 * 85) div 100 = 850000 to the other,
    // plus the 150000 base: exactly 1e6 again, every round
    assert(r === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("pageRank: hand-computed star ranks after two rounds") {
    // a -> b, a -> c (outdeg 2); b and c dangle (absorb only).
    val e = edges(1L -> 2L, 1L -> 3L)
    val r1 = GraphOps.pageRank(e, iterations = 1).as[(Long, Long)].collect().toMap
    // a: base only = 150000; b,c: 150000 + (1000000*85) div 200 = 575000
    assert(r1 === Map(1L -> 150000L, 2L -> 575000L, 3L -> 575000L))
    val r2 = GraphOps.pageRank(e, iterations = 2).as[(Long, Long)].collect().toMap
    // a: 150000; b,c: 150000 + (150000*85) div 200 = 213750
    assert(r2 === Map(1L -> 150000L, 2L -> 213750L, 3L -> 213750L))
  }

  test("pageRank mass never exceeds the initial allocation") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val s = spark.read.parquet(s"$sf/supplier.parquet")
    val e = GraphOps.tradeEdges(o, l, c, s, k = 3)
    val ranks = GraphOps.pageRank(e, iterations = 3)
    val n = ranks.count()
    val total = ranks.agg(sum("rank")).as[Long].head()
    // flooring and dangling-node absorption only ever LOSE mass; the
    // per-round base is the guaranteed floor
    assert(total <= n * 1000000L)
    assert(total >= n * 150000L)
  }

  test("degree stats: hand graph degrees and reciprocity") {
    // 1->2, 2->1 (reciprocal pair), 1->3, 3 has no out-edges
    val e = edges(1L -> 2L, 2L -> 1L, 1L -> 3L)
    val out = GraphOps.degreeStats(e).as[(Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(
      1L -> ((2L, 1L, 1L)),  // out 2, in 1 (from 2), recip: 1->2 only
      2L -> ((1L, 1L, 1L)),  // 2->1 reciprocated
      3L -> ((0L, 1L, 0L)))) // sink: in-degree only
  }

  test("min-cost paths: a cheap two-hop route beats the expensive direct edge") {
    // costs: 1e6 div n_lines. direct 1->3 carries 1 line (cost 1e6);
    // 1->2 and 2->3 carry 10 lines each (cost 1e5 each -> 2e5 total).
    val e = Seq((1L, 3L, 1L), (1L, 2L, 10L), (2L, 3L, 10L))
      .toDF("src", "dst", "n_lines")
    val out = GraphOps.minCostPaths(e, source = 1L, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 100000L, 3L -> 200000L))
    // with a single round the relaxation can only take the direct edge
    val one = GraphOps.minCostPaths(e, source = 1L, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(one(3L) === 1000000L)
  }

  test("label propagation: two components converge to their min ids") {
    // component {1,2,3} (min 1) and component {10,11} (min 10),
    // undirected edges supplied in both directions as tradePairEdges does
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val e = (base ++ base.map(_.swap)).toDF("src", "dst")
    val out = GraphOps.labelPropagation(e, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 10L -> 2L))
  }

  test("label propagation on a DIRECTED edge list keeps message-less nodes") {
    // 1 -> 2 -> 3 without the reverse edges: node 1 never receives a
    // message and must keep its own label (an inner-join kernel drops
    // it); labels flow only downstream
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = GraphOps.labelPropagation(e, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // after 3 rounds: 1 keeps 1; 2 got 1; 3 got 1 -> histogram {1 -> 3}
    assert(out === Map(1L -> 3L))
  }

  test("label propagation: one round only reaches direct neighbors") {
    // path 1-2-3-4: after one round node 4 sees only 3's initial label
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = (base ++ base.map(_.swap)).toDF("src", "dst")
    val hist = GraphOps.labelPropagation(e, rounds = 1)
      .as[(Long, Long)].collect().toMap
    // labels after round 1: 1->1, 2->1, 3->2, 4->3
    assert(hist === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }
}
