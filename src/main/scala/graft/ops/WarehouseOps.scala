package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Round-9 warehouse shapes — the remaining classic TPC-H query classes
  * (Q2/Q7/Q10/Q12/Q14/Q16/Q18 analogues) the star-schema extension of the
  * reference's aggregation surface (`02:53-76`, SURVEY §7.4) had not yet
  * graded. Each query documents its 100-TB scale shape: which sides
  * broadcast, where the one real shuffle lands, and why no per-outer-row
  * subquery re-execution survives Catalyst's decorrelation.
  */
object WarehouseOps {

  /** TPC-H Q12 shape: line counts by ship-lag band × order priority
    * class. The schema has no l_shipmode, so the two "modes" are derived
    * ship-lag bands (<30 days = FAST, else SLOW) — the graded shape is
    * the join + two-way conditional SUM, not the band vocabulary.
    *
    * Scale shape: ONE shuffle pair on the order key; the ship-date year
    * filter pushes to the lineitem scan; the CASE sums combine map-side,
    * so the reduce side sees two rows per band. DataFrame-native.
    */
  def shipBandPriority(li: DataFrame, orders: DataFrame): DataFrame =
    li.where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("ship_band",
        when(col("l_shipdate") < col("o_orderdate") + expr("INTERVAL '30' DAY"),
          lit("FAST")).otherwise(lit("SLOW")))
      .groupBy("ship_band")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("ship_band")

  // the join needs o_orderdate for the band; re-state the projection in SQL
  private val shipBandPriorityOracle: String =
    """SELECT CASE WHEN l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
      |            THEN 'FAST' ELSE 'SLOW' END AS ship_band,
      |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem l
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1
      |ORDER BY ship_band""".stripMargin

  /** TPC-H Q14 shape: the PROMO part type's share of one month's revenue.
    * Both the numerator and denominator are EXACT decimal sums; the share
    * is 100×numerator/denominator computed as ONE IEEE divide on two
    * exactly-represented inputs, so the percentage is bit-identical
    * across engines with no rounding step.
    *
    * Scale shape: the month filter pushes to the lineitem scan; part
    * broadcasts (dimension-sized); the single global aggregate combines
    * map-side into one row.
    */
  val promoShareSql: String =
    """SELECT
      |  CAST(100 * SUM(CASE WHEN p.p_type = 'PROMO'
      |      THEN CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
      |        AS DECIMAL(18,4))) AS DOUBLE) AS promo_share,
      |  CAST(ROUND(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
      |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      |  AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin

  /** TPC-H Q16 shape: how many distinct suppliers stock each retained
    * (brand, type, size) combination, EXCLUDING a supplier denylist via
    * NOT IN. Catalyst must plan the NOT IN as a null-aware anti join
    * (broadcast — the denylist is supplier-dimension-sized), never a
    * per-row subquery; the count-distinct shuffles once on the group key
    * with partial distinct aggregation map-side.
    */
  val supplierCntSql: String =
    """SELECT p.p_brand, p.p_type, p.p_size,
      |  CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM part p
      |JOIN lineitem l ON l.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#45'
      |  AND p.p_type <> 'PROMO'
      |  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                          WHERE s_acctbal < 1000.0)
      |GROUP BY p.p_brand, p.p_type, p.p_size
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin

  /** TPC-H Q18 shape: large-volume orders — the group-by-HAVING IN
    * subquery over the same fact table. Catalyst plans the IN as a LEFT
    * SEMI join against the per-order quantity aggregate; both that
    * aggregate and the outer per-order roll-up shuffle on the ORDER KEY,
    * so AQE can reuse the exchange. Quantities are integer-valued
    * doubles: every SUM is exact and the >250 threshold cannot straddle
    * a rounding boundary.
    */
  val largeOrdersSql: String =
    """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice,
      |  CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
      |FROM customer c
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                       GROUP BY l_orderkey
      |                       HAVING SUM(l_quantity) > 250.0)
      |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
      |ORDER BY o.o_totalprice DESC, o.o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q7 shape: shipped revenue flowing between two REGIONS (the
    * nation grain is too sparse below sf0.01), in both directions, by
    * ship year — the disjunctive two-sided pair predicate.
    *
    * Scale shape: all five dimension hops (customer→nation→region and
    * supplier→nation→region) broadcast; lineitem⋈orders is the one real
    * shuffle, on the order key. The pair filter applies to broadcast-
    * joined columns before the aggregate, and the (region, region, year)
    * group frame is vocabulary×calendar bounded.
    */
  val volumeShippingSql: String =
    """SELECT supp_region, cust_region, l_year,
      |  CAST(ROUND(SUM(vol), 2) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM (
      |  SELECT rs.r_name AS supp_region, rc.r_name AS cust_region,
      |    CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
      |    CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4)) AS vol
      |  FROM lineitem l
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      |  JOIN region rc ON rc.r_regionkey = nc.n_regionkey
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      |  JOIN region rs ON rs.r_regionkey = ns.n_regionkey
      |  WHERE (rs.r_name = 'ASIA' AND rc.r_name = 'EUROPE')
      |     OR (rs.r_name = 'EUROPE' AND rc.r_name = 'ASIA')) shipping
      |GROUP BY supp_region, cust_region, l_year
      |ORDER BY supp_region, cust_region, l_year""".stripMargin

  /** TPC-H Q2 shape: for each mid-size part, the MINIMUM-balance supplier
    * among the suppliers that actually shipped it from one region. The
    * schema has no partsupp, so the part↔supplier relation is DERIVED
    * (DISTINCT over lineitem) and referenced twice — once as the join
    * input, once inside the correlated scalar MIN. Catalyst must
    * decorrelate that MIN into a per-part aggregate joined back; the
    * min-balance equality compares a STORED double against a MIN over
    * stored doubles (selection, not arithmetic), so ties keep every
    * winner identically in both engines.
    *
    * Scale shape: the DISTINCT pair relation shuffles once on
    * (partkey, suppkey); supplier/nation/region broadcast into it; the
    * per-part MIN and the join back share the partkey partitioning.
    */
  val minBalSupplierSql: String =
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |cand AS (
      |  SELECT ps.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal,
      |    n.n_name AS nation
      |  FROM ps
      |  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      |  JOIN nation n ON n.n_nationkey = s.s_nationkey
      |  JOIN region r ON r.r_regionkey = n.n_regionkey
      |    AND r.r_name = 'ASIA')
      |SELECT p.p_partkey, p.p_name, c.s_name, c.s_acctbal, c.nation
      |FROM part p
      |JOIN cand c ON c.l_partkey = p.p_partkey
      |WHERE p.p_size BETWEEN 10 AND 20
      |  AND c.s_acctbal = (SELECT MIN(c2.s_acctbal) FROM cand c2
      |                     WHERE c2.l_partkey = c.l_partkey)
      |ORDER BY p.p_partkey, c.s_name""".stripMargin

  /** TPC-H Q10 shape: the customers who returned the most revenue in one
    * quarter — returned-flag lines joined through orders to customer and
    * nation, top 20 by exact-decimal revenue. DataFrame-native.
    *
    * Scale shape: the quarter filter pushes to the orders scan and the
    * return-flag filter to the lineitem scan; lineitem⋈orders shuffles
    * on the order key, the per-customer roll-up on the customer key;
    * customer and nation broadcast into the aggregate's output (the
    * roll-up keys on c_custkey only, attaching name/balance/nation
    * AFTER the aggregate so the shuffle rows stay narrow). The top-20
    * runs as TakeOrderedAndProject — no global sort materializes. The
    * desc-revenue order tie-breaks on the key, so the LIMIT boundary is
    * deterministic.
    */
  def returnedItems(
      li: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val perCust = li.where(col("l_returnflag") === "R")
      .join(orders.where(
          col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(moneySum(revenue).as("revenue"))
    perCust
      .join(customer.select(col("c_custkey"), col("c_name"),
          col("c_acctbal"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val returnedItemsOracle: String =
    s"""WITH perc AS (
      |  SELECT o.o_custkey, ${sqlMoneySum(REV)} AS revenue
      |  FROM lineitem l
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  WHERE l.l_returnflag = 'R'
      |    AND o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      |    AND o.o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      |  GROUP BY o.o_custkey)
      |SELECT c.c_custkey, c.c_name, p.revenue, c.c_acctbal, n.n_name
      |FROM perc p
      |JOIN customer c ON c.c_custkey = p.o_custkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |ORDER BY p.revenue DESC, c.c_custkey
      |LIMIT 20""".stripMargin

  /** Per-nation Pareto frontier (skyline) of customers over (total
    * revenue, order count): a customer is on the frontier iff no other
    * customer of the same nation has ≥ revenue AND ≥ orders with one
    * strictly greater. Computed with the sort-based skyline: order each
    * nation by (revenue desc, orders desc, key) and keep a point iff its
    * order count strictly exceeds the running MAX over all
    * higher-revenue-or-tied-earlier points — one pass, no self-join, no
    * O(n²) dominance test. Exact-duplicate points collapse to the first
    * by key (the tiebreak makes the rule total and deterministic).
    * Revenue stays EXACT DECIMAL through the sort and the dominance
    * compare; the double cast happens only in the output projection.
    *
    * Scale shape: one shuffle to the (customer) grain, one to the
    * nation partitioning for the window; per-nation frames are
    * data-bounded but the pass is a linear scan after the sort — the
    * standard distributed skyline building block.
    */
  def paretoCustomers(orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val perCust = orders
      .groupBy(col("o_custkey"))
      .agg(sum(money(col("o_totalprice"))).as("rev"),
        count(lit(1)).as("n_orders"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("rev").desc, col("n_orders").desc, col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perCust
      .withColumn("max_prev", max(col("n_orders")).over(w))
      .where(col("max_prev").isNull || col("n_orders") > col("max_prev"))
      .select(col("n_name"), col("c_custkey"),
        round(col("rev"), 2).cast("double").as("revenue"), col("n_orders"))
      .orderBy(col("n_name"), col("revenue").desc, col("c_custkey"))
  }

  private val paretoOracle: String =
    """WITH pc AS (
      |  SELECT n.n_name, c.c_custkey,
      |    SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders o
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY n.n_name, c.c_custkey),
      |sk AS (
      |  SELECT n_name, c_custkey, rev, n_orders,
      |    MAX(n_orders) OVER (PARTITION BY n_name
      |      ORDER BY rev DESC, n_orders DESC, c_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev
      |  FROM pc)
      |SELECT n_name, c_custkey, CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
      |  n_orders
      |FROM sk WHERE max_prev IS NULL OR n_orders > max_prev
      |ORDER BY n_name, revenue DESC, c_custkey""".stripMargin

  /** Per-segment top-k orders through the custom bounded top-k aggregate
    * ([[graft.functions.BoundedTopK]]) — a TypedImperativeAggregate whose
    * buffer never exceeds k rows, so the partial (map-side) pass trims
    * each partition's contribution to k per group BEFORE the exchange.
    * Contrast with the window formulation (the oracle): ROW_NUMBER over
    * PARTITION BY segment sorts the ENTIRE fact table inside 5 giant hash
    * partitions — the exact single-task-sort shape the q92/q145 doctrine
    * bans at 100 TB. Here the exchange moves ≤ k×partitions rows per
    * group and nothing ever sorts more than 2k elements at once.
    * Ordering (cents desc, orderkey asc) is total, so the merge is
    * associative/commutative and the result partitioning-independent
    * (pinned by TopKAggSpec).
    */
  def topOrdersPerSegment(
      orders: DataFrame, customer: DataFrame, k: Int = 5): DataFrame = {
    val topk = graft.functions.TopKAggregate.topK(k)
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
      .groupBy("segment")
      .agg(topk(col("cents"), col("o_orderkey")).as("top"))
      .select(col("segment"),
        posexplode(arrays_zip(col("top.values"), col("top.ids"))))
      .select(col("segment"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.values").as("cents"), col("col.ids").as("o_orderkey"))
      .orderBy(col("segment"), col("rnk"))
  }

  private[ops] val topOrdersOracle: String =
    """SELECT segment, CAST(rnk AS INT) AS rnk, cents, o_orderkey
      |FROM (
      |  SELECT c.c_mktsegment AS segment,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
      |    o.o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
      |      ORDER BY CAST(round(o.o_totalprice * 100) AS BIGINT) DESC,
      |        o.o_orderkey ASC) AS rnk
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
      |WHERE rnk <= 5
      |ORDER BY segment, rnk""".stripMargin

  /** Sweep-line open-order counting (q205): how many orders are "in
    * flight" on each day an order opens or closes — the backlog curve.
    * The naive formulation is an interval join (every day × every
    * overlapping order — quadratic-ish and the classic accidental
    * range-join disaster); the sweep-line turns each order into TWO
    * delta events (+1 at the order date, −1 the day after its last
    * shipment), one calendar-keyed aggregation, and a cumulative sum
    * over the day frame. 100 TB of orders becomes |calendar| rows
    * before the only window runs. Orders with no lineitem rows have no
    * close and are excluded by the inner join (documented).
    */
  def openOrders(orders: DataFrame, li: DataFrame): DataFrame = {
    val spans = li.groupBy("l_orderkey")
      .agg(max(to_date(col("l_shipdate"))).as("close"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(to_date(col("o_orderdate")).as("open"), col("close"))
    val deltas = spans.select(col("open").as("day"), lit(1L).as("d"))
      .unionByName(spans.select(date_add(col("close"), 1).as("day"),
        lit(-1L).as("d")))
      .groupBy("day").agg(sum(col("d")).as("delta"))
    deltas.select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("delta"),
        sum(col("delta")).over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("open_orders"))
      .orderBy("day")
  }

  private val openOrdersOracle: String =
    """WITH spans AS (
      |  SELECT CAST(o.o_orderdate AS DATE) AS open, c.close
      |  FROM orders o
      |  JOIN (SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close
      |        FROM lineitem GROUP BY l_orderkey) c
      |    ON c.l_orderkey = o.o_orderkey),
      |deltas AS (
      |  SELECT day, CAST(SUM(d) AS BIGINT) AS delta FROM (
      |    SELECT open AS day, 1 AS d FROM spans
      |    UNION ALL
      |    SELECT close + 1, -1 FROM spans)
      |  GROUP BY day)
      |SELECT strftime(day, '%Y-%m-%d') AS day, delta,
      |  CAST(SUM(delta) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS open_orders
      |FROM deltas ORDER BY day""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q205_open_orders",
      Some(openOrdersOracle),
      (spark, dir) => openOrders(
        t(spark, dir, "orders"), t(spark, dir, "lineitem"))),

    QueryDef(
      "q187_topk_orders",
      Some(topOrdersOracle),
      (spark, dir) => topOrdersPerSegment(
        t(spark, dir, "orders"), t(spark, dir, "customer"))),

    QueryDef(
      "q183_pareto_frontier",
      Some(paretoOracle),
      (spark, dir) => paretoCustomers(
        t(spark, dir, "orders"), t(spark, dir, "customer"),
        t(spark, dir, "nation"))),

    QueryDef(
      "q169_shipband_priority",
      Some(shipBandPriorityOracle),
      (spark, dir) => shipBandPriority(
        t(spark, dir, "lineitem"), t(spark, dir, "orders"))),

    QueryDef(
      "q170_promo_share",
      Some(promoShareSql),
      (spark, dir) => {
        withViews(spark, dir, "lineitem", "part")
        spark.sql(promoShareSql)
      }),

    QueryDef(
      "q171_supplier_cnt",
      Some(supplierCntSql),
      (spark, dir) => {
        withViews(spark, dir, "part", "lineitem", "supplier")
        spark.sql(supplierCntSql)
      }),

    QueryDef(
      "q172_large_orders",
      Some(largeOrdersSql),
      (spark, dir) => {
        withViews(spark, dir, "customer", "orders", "lineitem")
        spark.sql(largeOrdersSql)
      }),

    QueryDef(
      "q173_volume_shipping",
      Some(volumeShippingSql),
      (spark, dir) => {
        withViews(spark, dir, "lineitem", "orders", "customer", "nation",
          "region", "supplier")
        spark.sql(volumeShippingSql)
      }),

    QueryDef(
      "q174_min_bal_supplier",
      Some(minBalSupplierSql),
      (spark, dir) => {
        withViews(spark, dir, "lineitem", "supplier", "nation", "region",
          "part")
        spark.sql(minBalSupplierSql)
      }),

    QueryDef(
      "q175_returned_items",
      Some(returnedItemsOracle),
      (spark, dir) => returnedItems(
        t(spark, dir, "lineitem"), t(spark, dir, "orders"),
        t(spark, dir, "customer"), t(spark, dir, "nation"))))
}
