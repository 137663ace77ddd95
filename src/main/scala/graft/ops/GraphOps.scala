package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Graph analytics over a derived entity graph (SURVEY §7.4 extension
  * tier): bounded-hop BFS reachability and an integer-exact PageRank
  * power iteration. The reference has no graph operators; these are the
  * two primitives a lineage/link-analysis pass over a 100 TB corpus
  * needs beyond q51's connected components — "how far is X from Y"
  * (frontier propagation) and "which nodes matter" (full relaxation).
  *
  * The graph is DERIVED from the facts: a directed trade edge
  * cust-nation -> supp-nation for each nation's top-3 partner nations by
  * lineitem count (count desc, dst key asc tiebreak — deterministic).
  * Scale shape: the expensive step is the fact-fact edge aggregation —
  * orders×lineitem join on orderkey, then groupBy (src, dst) where
  * partial aggregation crushes the pair counts map-side to a
  * dimension-bounded relation (≤ nations² rows) before the shuffle. The
  * iterations that follow run on that bounded relation: each round is a
  * broadcast-sized join, so a 1000-executor cluster pays the fact scan
  * once and the graph loop costs nothing. A document-scale graph (web
  * links, citation edges) runs the SAME loop with the edge relation left
  * shuffle-partitioned and per-round localCheckpoint — the q51 doctrine.
  */
object GraphOps {

  /** Directed trade edges: top-`k` supplier nations per customer nation
    * by lineitem count; `outdeg` rides along for the PageRank divide.
    */
  def tradeEdges(
      orders: DataFrame,
      lineitem: DataFrame,
      customer: DataFrame,
      supplier: DataFrame,
      k: Int = 3): DataFrame = {
    require(k > 0, s"top-k partner count must be positive, got $k")
    val pairs = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("n_lines"))
    val byVolume = Window.partitionBy(col("src"))
      .orderBy(col("n_lines").desc, col("dst").asc)
    val top = pairs.withColumn("rnk", row_number().over(byVolume))
      .where(col("rnk") <= k)
      .select(col("src"), col("dst"), col("n_lines"))
    top.withColumn("outdeg",
      count(lit(1)).over(Window.partitionBy(col("src"))))
  }

  /** Shared oracle fragment: the same edge derivation in DuckDB SQL. */
  private def edgesSql(k: Int): String =
    s"""pairs AS (
       |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
       |    CAST(s.s_nationkey AS BIGINT) AS dst, COUNT(*) AS n_lines
       |  FROM orders o
       |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2),
       |e AS (
       |  SELECT src, dst, n_lines,
       |    COUNT(*) OVER (PARTITION BY src) AS outdeg
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src
       |          ORDER BY n_lines DESC, dst ASC) AS rnk
       |        FROM pairs)
       |  WHERE rnk <= $k)""".stripMargin

  /** Bounded-hop BFS: minimum hop distance from `source` over the trade
    * graph, up to `maxHops`. Classic frontier expansion — round h joins
    * only the hop-(h-1) frontier against the edge relation, unions into
    * the visited set, and keeps the min distance; rows already seen at a
    * smaller distance never re-expand (the `left_anti` prune), so each
    * round's join input is the NEW frontier only. On a billion-node graph
    * the visited set stays hash-partitioned on the node id across rounds
    * (one shuffle per round, no growing lineage — localCheckpoint per
    * round caps the plan; at this dimension-bounded size the loop is
    * broadcast-shaped and the checkpoint is skipped).
    */
  def bfsHops(edges: DataFrame, source: Long, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be non-negative, got $maxHops")
    val e = edges.select(col("src"), col("dst"))
    var visited = e.sparkSession.range(1)
      .select(lit(source).as("nation"), lit(0).cast("int").as("hops"))
    var frontier = visited
    for (h <- 1 to maxHops) {
      val next = frontier.join(e, frontier("nation") === e("src"))
        .select(col("dst").as("nation"), lit(h).cast("int").as("hops"))
        .distinct()
        .join(visited.select("nation"), Seq("nation"), "left_anti")
      visited = visited.unionByName(next)
      frontier = next
    }
    visited.groupBy("nation").agg(min(col("hops")).as("hops"))
  }

  /** Integer-exact PageRank power iteration. Ranks live on a fixed
    * micro-unit grid (1e6 = 1.0) and every redistribution is BIGINT
    * arithmetic — `(rank * 85) div (100 * outdeg)` — so each iteration is
    * order-independent, engine-identical, and mergeable across any
    * partitioning (the q97/q141 exactness doctrine applied to an
    * iterative fixed point; floats would drift by summation order).
    * Damping 0.85 as the exact ratio 85/100; the flooring leak (at most
    * outdeg-1 micro-units per node per round) is deterministic in both
    * engines. Dangling-in-degree-only nodes absorb rank (documented leak,
    * standard in push-style formulations).
    */
  def pageRank(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 0, s"iterations must be non-negative, got $iterations")
    val e = edges.select(col("src"), col("dst"), col("outdeg"))
    val nodes = e.select(col("src").as("nation"))
      .unionByName(e.select(col("dst").as("nation")))
      .distinct()
    var ranks = nodes.select(col("nation"), lit(1000000L).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = ranks.join(e, ranks("nation") === e("src"))
        .select(col("dst").as("nation"),
          expr("(rank * 85) div (100 * outdeg)").as("c"))
        .groupBy("nation")
        .agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(contrib, Seq("nation"), "left_outer")
        .select(col("nation"),
          (lit(150000L) + coalesce(col("inflow"), lit(0L))).as("rank"))
    }
    ranks
  }

  private val bfsOracle: String =
    s"""WITH RECURSIVE ${edgesSql(3)},
       |walk(nation, hops) AS (
       |  SELECT CAST(0 AS BIGINT), 0
       |  UNION
       |  SELECT e.dst, walk.hops + 1
       |  FROM walk JOIN e ON e.src = walk.nation
       |  WHERE walk.hops < 4),
       |bfs AS (SELECT nation, MIN(hops) AS hops FROM walk GROUP BY nation)
       |SELECT n.n_name AS nation, CAST(bfs.hops AS INT) AS hops
       |FROM bfs JOIN nation n ON n.n_nationkey = bfs.nation
       |ORDER BY hops, nation""".stripMargin

  private val pageRankOracle: String = {
    def round(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT nodes.nation,
         |    150000 + COALESCE(SUM(f.c), 0) AS rank
         |  FROM nodes
         |  LEFT JOIN (SELECT e.dst, (r.rank * 85) // (100 * e.outdeg) AS c
         |             FROM e JOIN $prev r ON r.nation = e.src) f
         |    ON f.dst = nodes.nation
         |  GROUP BY nodes.nation)""".stripMargin
    s"""WITH ${edgesSql(3)},
       |nodes AS (SELECT src AS nation FROM e UNION SELECT dst FROM e),
       |r0 AS (SELECT nation, CAST(1000000 AS BIGINT) AS rank FROM nodes),
       |${round("r0", "r1")},
       |${round("r1", "r2")},
       |${round("r2", "r3")}
       |SELECT n.n_name AS nation, CAST(r3.rank AS BIGINT) AS rank_micros
       |FROM r3 JOIN nation n ON n.n_nationkey = r3.nation
       |ORDER BY rank_micros DESC, nation""".stripMargin
  }

  /** Degree/reciprocity profile (q199): per-node out/in degree and the
    * count of out-edges whose reverse edge also exists — the first
    * health report run on any derived graph (a near-zero reciprocity on
    * a supposedly-mutual relation, or a degree histogram with an
    * unexpected hub, is how bad edge derivations get caught). All exact
    * integer counts: two degree aggregates plus one left-semi self-join
    * on the swapped key, each a dimension-bounded shuffle here and a
    * plain key-partitioned one on a billion-node graph.
    */
  def degreeStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val out = e.groupBy(col("src").as("nation"))
      .agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("nation"))
      .agg(count(lit(1)).as("in_deg"))
    val recip = e.join(e.select(col("dst").as("r_src"), col("src").as("r_dst")),
        col("src") === col("r_src") && col("dst") === col("r_dst"), "left_semi")
      .groupBy(col("src").as("nation"))
      .agg(count(lit(1)).as("n_recip"))
    out.join(in, Seq("nation"), "full_outer")
      .join(recip, Seq("nation"), "left_outer")
      .select(col("nation"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("n_recip"), lit(0L)).as("n_recip"))
  }

  private val degreeStatsOracle: String =
    s"""WITH ${edgesSql(3)},
       |od AS (SELECT src AS node, COUNT(*) AS out_deg FROM e GROUP BY src),
       |id AS (SELECT dst AS node, COUNT(*) AS in_deg FROM e GROUP BY dst),
       |rc AS (SELECT a.src AS node, COUNT(*) AS n_recip
       |  FROM e a WHERE EXISTS (SELECT 1 FROM e b
       |    WHERE b.src = a.dst AND b.dst = a.src)
       |  GROUP BY a.src)
       |SELECT n.n_name AS nation,
       |  CAST(COALESCE(od.out_deg, 0) AS BIGINT) AS out_deg,
       |  CAST(COALESCE(id.in_deg, 0) AS BIGINT) AS in_deg,
       |  CAST(COALESCE(rc.n_recip, 0) AS BIGINT) AS n_recip
       |FROM od FULL OUTER JOIN id USING (node)
       |LEFT JOIN rc USING (node)
       |JOIN nation n ON n.n_nationkey = node
       |ORDER BY nation""".stripMargin

  /** Weighted shortest paths (q202): min-COST routes, where BFS (q185)
    * counts hops — the other half of the path-analytics pair. Edge cost
    * is the exact BIGINT 1e6 div n_lines (high-volume partners are
    * cheap), and each round is one min-plus relaxation: dist_r(d) =
    * min(dist_{r-1}(d), min over edges (dist_{r-1}(src) + cost)) —
    * Bellman-Ford restricted to `rounds` hops, every value integer so
    * the fixed point is engine-identical. Same dimension-bounded loop
    * economics as q186; a billion-node graph keeps dist hash-partitioned
    * on the node and checkpoints per round.
    */
  def minCostPaths(edges: DataFrame, source: Long, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be non-negative, got $rounds")
    val e = edges.select(col("src"), col("dst"),
      expr("1000000L div n_lines").as("ecost"))
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("cost"))
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(col("dst").as("node"), (col("cost") + col("ecost")).as("cost"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min(col("cost")).as("cost"))
    }
    dist
  }

  private val minCostOracle: String = {
    def relax(prev: String, cur: String): String =
      s"""$cur AS (SELECT node, MIN(cost) AS cost FROM (
         |  SELECT node, cost FROM $prev
         |  UNION ALL
         |  SELECT ec.dst, $prev.cost + ec.cost
         |  FROM $prev JOIN ec ON ec.src = $prev.node) GROUP BY node)""".stripMargin
    s"""WITH ${edgesSql(3)},
       |ec AS (SELECT src, dst, 1000000 // n_lines AS cost FROM e),
       |d0(node, cost) AS (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT))),
       |${relax("d0", "d1")},
       |${relax("d1", "d2")},
       |${relax("d2", "d3")}
       |SELECT n.n_name AS nation, CAST(d3.cost AS BIGINT) AS cost
       |FROM d3 JOIN nation n ON n.n_nationkey = d3.node
       |ORDER BY cost, nation""".stripMargin
  }

  /** Triangle participation (q211): count triangles per nation in the
    * undirected view of the trade graph, via degree-ordered edge
    * orientation — each undirected edge points from its (degree, id)-
    * smaller endpoint to the larger, so every triangle has exactly one
    * apex with two out-edges and is counted once. The classic scale
    * property: orientation bounds every node's out-degree by O(sqrt(m)),
    * so the wedge self-join fans out to at most m^1.5 pairs TOTAL even
    * on hub-heavy graphs, where the naive three-way join is quadratic in
    * the hub degree. Wedges close via one semi join keyed on the
    * canonical (min, max) pair. Dimension-bounded here; on a
    * billion-edge graph the same three joins run hash-partitioned on
    * 8-byte node ids.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db")
            || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val wedges = oriented.select(col("u"), col("v").as("x"))
      .join(oriented.select(col("u"), col("v").as("y")), Seq("u"))
      .where(col("x") < col("y"))
    val tri = wedges.join(und,
      col("x") === col("a") && col("y") === col("b"), "left_semi")
    tri.select(col("u").as("node"))
      .unionByName(tri.select(col("x").as("node")))
      .unionByName(tri.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  private val triangleOracle: String =
    s"""WITH ${edgesSql(3)},
       |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |  FROM e WHERE src <> dst),
       |deg AS (SELECT node, COUNT(*) AS deg FROM
       |  (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
       |  GROUP BY node),
       |ori AS (SELECT
       |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
       |      THEN a ELSE b END AS u,
       |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
       |      THEN b ELSE a END AS v
       |  FROM und JOIN deg da ON da.node = a JOIN deg db ON db.node = b),
       |tri AS (SELECT w.u, w.x, w.y FROM
       |    (SELECT e1.u, e1.v AS x, e2.v AS y
       |     FROM ori e1 JOIN ori e2 ON e1.u = e2.u AND e1.v < e2.v) w
       |  WHERE EXISTS (SELECT 1 FROM und WHERE a = w.x AND b = w.y)),
       |n3 AS (SELECT u AS node FROM tri
       |  UNION ALL SELECT x FROM tri UNION ALL SELECT y FROM tri)
       |SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_triangles
       |FROM n3 JOIN nation n ON n.n_nationkey = node
       |GROUP BY 1 ORDER BY n_triangles DESC, nation""".stripMargin

  /** Undirected customer–supplier bipartite edges: one row per distinct
    * trading pair from the order lines, with ids disambiguated onto one
    * node space (customers even, suppliers odd). Unlike the 25-node
    * nation graph above, this projection carries thousands of nodes and
    * grows with the fact table — the scale tier the propagation loop is
    * written for.
    */
  def tradePairEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    // one month of ship activity: the window an account-graph job
    // actually runs over, and sparse enough that the community
    // structure is non-trivial (the full-history projection collapses
    // to one giant component and grades nothing)
    val pairs = orders
      .join(lineitem.where(
        col("l_shipdate") >= lit("1998-06-01 00:00:00").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1998-07-01 00:00:00").cast("timestamp_ntz")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
  }

  /** q263 body: K rounds of synchronous min-label propagation (the
    * hash-min community/component kernel) over the customer–supplier
    * graph. Every node starts labeled with its own id; each round a node
    * takes the min of its label and its neighbors' labels — after K
    * rounds a node's label is the smallest id within K hops, so the
    * label histogram is a deterministic community profile with no
    * float, RNG, or tie-break ambiguity. Bounded K grades the
    * propagation kernel itself; run-to-convergence reuses q51's
    * active-set + localCheckpoint doctrine (DedupOps.dupClusters).
    *
    * Scale shape: one shuffle per round, keyed on the node id — edges
    * and labels hash-partition identically so rounds reuse the
    * partitioning; messages combine map-side (min). No all-pairs, no
    * driver-side state; the output is label-bounded (communities), not
    * node-bounded.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col("src"), col("dst"))
    var labels = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val msgs = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst").as("m_node"))
        .agg(min(col("label")).as("m_label"))
      // LEFT join: a node with no in-edges receives no message that
      // round and must KEEP its label, not vanish (an inner join here
      // silently deletes such nodes on any non-symmetric edge list)
      labels = labels.join(msgs, col("node") === col("m_node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("m_label"), col("label")))
            .as("label"))
    }
    labels.groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("label"))
  }

  /** Oracle generated from the SAME round count as the graded body (the
    * q180 bpeChainSql doctrine: parameter and oracle cannot drift).
    */
  private def labelPropOracle(rounds: Int): String = {
    def round(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT l.node, LEAST(l.label, MIN(p.label)) AS label
         |  FROM $prev l
         |  JOIN ed ON ed.dst = l.node
         |  JOIN $prev p ON p.node = ed.src
         |  GROUP BY l.node, l.label)""".stripMargin
    val chain = (1 to rounds)
      .map(r => round(s"l${r - 1}", s"l$r")).mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-07-01 00:00:00'),
       |ed AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b, a FROM pairs),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM ed),
       |$chain
       |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |FROM l$rounds GROUP BY label ORDER BY label""".stripMargin
  }

  private val lpaRounds = 3

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q263_graph_communities", Some(labelPropOracle(lpaRounds)),
      (spark, dir) => labelPropagation(
        tradePairEdges(t(spark, dir, "orders"), t(spark, dir, "lineitem"))
          .localCheckpoint(),
        rounds = lpaRounds)),

    // Degree-oriented triangle counting over the undirected trade graph;
    // the oracle recomputes the same orientation + wedge-close in SQL.
    QueryDef("q211_trade_triangles", Some(triangleOracle),
      (spark, dir) => {
        val tri = triangleStats(
          tradeEdges(t(spark, dir, "orders"), t(spark, dir, "lineitem"),
            t(spark, dir, "customer"), t(spark, dir, "supplier"))
            .localCheckpoint())
        tri.join(broadcast(t(spark, dir, "nation")),
            tri("node") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("n_triangles"))
          .orderBy(col("n_triangles").desc, col("nation"))
      }),

    QueryDef("q202_min_cost_paths", Some(minCostOracle),
      (spark, dir) => {
        val dist = minCostPaths(
          tradeEdges(t(spark, dir, "orders"), t(spark, dir, "lineitem"),
            t(spark, dir, "customer"), t(spark, dir, "supplier"))
            .localCheckpoint(),
          source = 0L, rounds = 3)
        dist.join(broadcast(t(spark, dir, "nation")),
            dist("node") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("cost"))
          .orderBy("cost", "nation")
      }),

    QueryDef("q199_degree_stats", Some(degreeStatsOracle),
      (spark, dir) => {
        val stats = degreeStats(
          tradeEdges(t(spark, dir, "orders"), t(spark, dir, "lineitem"),
            t(spark, dir, "customer"), t(spark, dir, "supplier"))
            .localCheckpoint())
        stats.join(broadcast(t(spark, dir, "nation")),
            stats("nation") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("out_deg"), col("in_deg"),
            col("n_recip"))
          .orderBy("nation")
      }),

    // Bounded 4-hop BFS from nation 0 over the top-3 trade graph; the
    // oracle walks the same edges with a recursive CTE. min() over the
    // union of rounds == true BFS distance because round h only ever
    // labels nodes at distance exactly h or revisits (pruned).
    QueryDef("q185_trade_hops", Some(bfsOracle),
      (spark, dir) => {
        // materialize the dimension-bounded edge relation ONCE before
        // iterating: without the checkpoint the lazy lineage re-runs the
        // fact-fact aggregation on every frontier round (4x the corpus
        // scan at 100 TB); localCheckpoint also severs the growing
        // iteration lineage (the q51 doctrine)
        val hops = bfsHops(
          tradeEdges(t(spark, dir, "orders"), t(spark, dir, "lineitem"),
            t(spark, dir, "customer"), t(spark, dir, "supplier"))
            .localCheckpoint(),
          source = 0L, maxHops = 4)
        hops.join(broadcast(t(spark, dir, "nation")),
            hops("nation") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("hops"))
          .orderBy(col("hops"), col("nation"))
      }),

    // Three integer-exact PageRank rounds over the same graph; the
    // oracle unrolls the iterations as chained CTEs with the identical
    // BIGINT floor-divide redistribution.
    QueryDef("q186_trade_pagerank", Some(pageRankOracle),
      (spark, dir) => {
        // same edge checkpoint as q185: 3 rank rounds otherwise re-run
        // the fact aggregation per join
        val ranks = pageRank(
          tradeEdges(t(spark, dir, "orders"), t(spark, dir, "lineitem"),
            t(spark, dir, "customer"), t(spark, dir, "supplier"))
            .localCheckpoint(),
          iterations = 3)
        ranks.join(broadcast(t(spark, dir, "nation")),
            ranks("nation") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("rank").as("rank_micros"))
          .orderBy(col("rank_micros").desc, col("nation"))
      }))
}
