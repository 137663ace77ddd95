package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.util.Tables._

/** Correlated-subquery and multi-dimension analytic shapes — the classic
  * warehouse query patterns (TPC-H Q4/Q17/Q8 style) the reference's
  * single-table notebooks never reach but any analyst pointed at the same
  * star schema writes on day one (aggregazioni surface 02:61-96 extended
  * per SURVEY §7.4).
  *
  * These three queries exist to grade Catalyst's subquery DECORRELATION:
  * q126/q127 are written as correlated SQL (EXISTS / scalar-aggregate
  * subquery) and must execute as joins — a per-outer-row subquery
  * re-execution would be a scale-killer at 100 TB. PlanSpec asserts the
  * physical plans contain the decorrelated join operators and no
  * iterative subquery nodes.
  */
object RelationalOps {

  /** TPC-H Q4 shape: orders placed in 1997 that have at least one line
    * shipped more than 90 days after the order date, counted by priority.
    *
    * Written as a correlated EXISTS on purpose: Catalyst rewrites it to a
    * LEFT SEMI join of orders against lineitem on l_orderkey with the
    * non-equi ship-lag predicate as the join condition. Scale shape: ONE
    * shuffle pair on the order key (or a broadcast of the filtered order
    * year if small); the semi join stops probing a key after the first
    * match, so multi-line orders cost one emit. The date filter on orders
    * is pushed to the parquet scan.
    */
  val existsPrioritySql: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL '90' DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // DuckDB spells a day interval without quotes; everything else is shared.
  private val existsPriorityOracle: String =
    existsPrioritySql.replace("INTERVAL '90' DAY", "INTERVAL 90 DAY")

  /** TPC-H Q17 shape: revenue from "small-quantity" lines of one brand —
    * lines whose quantity is below half the average quantity ever ordered
    * for that part.
    *
    * Written as a correlated scalar-aggregate subquery: Catalyst
    * decorrelates it into a per-part AVG aggregate joined back to the
    * filtered lineitem on l_partkey. Scale shape: the inner aggregate runs
    * ONCE over lineitem (map-side partial combine, one shuffle on
    * l_partkey), not once per outer row; the brand filter reduces the
    * probe side via the broadcast part dimension before the threshold
    * join. Bit-stability: quantities are integer-valued doubles, so the
    * per-part double SUM is exact in any order, the AVG is one IEEE
    * divide, and the 0.5× threshold compare cannot straddle an
    * engine-dependent rounding boundary; revenue goes through the exact
    * DECIMAL(18,4) money path.
    */
  val smallQtyRevenueSql: String =
    """SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
      |    AS small_qty_revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#12'
      |  AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
      |                      FROM lineitem l2
      |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  /** TPC-H Q8 shape: one nation's share of a part type's revenue among
    * customers of one region, by order year.
    *
    * DataFrame-native multi-dimension join: part (type-filtered), the
    * region→nation→customer chain, and supplier→nation are all broadcast
    * (each is dimension-sized at any corpus scale); only
    * lineitem⋈orders shuffles, on the order key. The share is
    * numerator/denominator of two EXACT decimal sums cast to double and
    * divided once — a single IEEE operation on identical inputs in both
    * engines, so no rounding step is needed for bit-equality.
    */
  def marketShare(
      li: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, part: DataFrame, nation: DataFrame,
      region: DataFrame, targetNation: String = "NATION_7",
      regionName: String = "ASIA", partType: String = "PROMO"): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.where(col("r_name") === regionName)
          .select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val regionCust = customer
      .join(broadcast(regionNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val zero = lit(0).cast(DecimalType(18, 4))
    li
      .join(broadcast(part.where(col("p_type") === partType)
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(regionCust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === targetNation, money(revenue))
          .otherwise(zero)), 2).cast("double").as("nation_vol"),
        round(sum(money(revenue)), 2).cast("double").as("total_vol"),
        (sum(when(col("supp_nation") === targetNation, money(revenue))
          .otherwise(zero)).cast("double") /
          sum(money(revenue)).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val marketShareOracle: String =
    s"""WITH joined AS (
      |  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
      |    CAST($REV AS DECIMAL(18,4)) AS vol,
      |    sn.n_name AS supp_nation
      |  FROM lineitem l
      |  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      |  JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN nation sn ON sn.n_nationkey = s.s_nationkey)
      |SELECT o_year,
      |  CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol
      |                      ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
      |    AS nation_vol,
      |  CAST(ROUND(SUM(vol), 2) AS DOUBLE) AS total_vol,
      |  CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol
      |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
      |FROM joined
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    * finalized multi-supplier order — one correlated EXISTS and one
    * correlated NOT EXISTS (with an outer reference two scopes up, to
    * o.o_orderdate) in the same query, the heaviest decorrelation
    * pattern in the classic suite. Catalyst plans the EXISTS as a LEFT
    * SEMI join and the NOT EXISTS as a LEFT ANTI join, both keyed on the
    * order (asserted in RelationalCorpusSpec); lineitem is scanned three
    * times but every arm shuffles on l_orderkey and aggregates map-side,
    * and no per-outer-row re-execution survives planning. The
    * ship-lag predicate mirrors q126's (the schema has no
    * receipt/commit dates).
    */
  val soleLateSupplierSql: String =
    """SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL '60' DAY)
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s.s_name
      |LIMIT 20""".stripMargin

  private val soleLateSupplierOracle: String =
    soleLateSupplierSql.replace("INTERVAL '60' DAY", "INTERVAL 60 DAY")

  /** Order-independent per-partition table checksum — the anti-entropy /
    * migration-validation primitive: two engines (or two replicas, or
    * pre/post-migration copies) agree on a partition iff its (rows,
    * checksum) pair agrees, without moving the data. Each row folds EVERY
    * character of a canonical '|'-joined string through a polynomial hash
    * (row-local, codegen'd; an earlier draft folded only each field's
    * length and first character, which missed any length-preserving edit
    * past position 1 — e.g. a day-of-month change); the partition
    * checksum is the SUM of row fingerprints — commutative, so partition
    * order, task order, and merge order are all irrelevant. fp < 1000003
    * keeps any realistic partition's sum far from BIGINT range. Scale
    * shape: scan-speed map side, one tiny month-cardinality shuffle.
    */
  def partitionChecksum(orders: DataFrame): DataFrame =
    orders
      .withColumn("rowstr", concat_ws("|",
        col("o_orderkey").cast("string"), col("o_orderstatus"),
        col("o_orderpriority"), date_format(col("o_orderdate"), "yyyy-MM-dd")))
      .withColumn("fp", expr(
        "aggregate(sequence(1, length(rowstr)), CAST(0 AS BIGINT), " +
          "(a, i) -> (a * 131 + ascii(substring(rowstr, i, 1))) % 1000003)"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_rows"), sum(col("fp")).as("checksum"))
      .orderBy("month")

  private val partitionChecksumOracle: String =
    """WITH rows_ AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(
      |          generate_series(1, length(
      |            CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
      |            o_orderpriority || '|' || strftime(o_orderdate, '%Y-%m-%d'))),
      |          i -> CAST(ascii(substring(
      |            CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
      |            o_orderpriority || '|' || strftime(o_orderdate, '%Y-%m-%d'),
      |            CAST(i AS INT), 1)) AS BIGINT))),
      |      (a, b) -> (a * 131 + b) % 1000003) AS fp
      |  FROM orders)
      |SELECT month, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(fp) AS BIGINT) AS checksum
      |FROM rows_ GROUP BY month ORDER BY month""".stripMargin

  /** Gap-filled monthly revenue series via WITH RECURSIVE — the recursive
    * CTE surface (new in Spark 4), exercised on the one shape where
    * recursion is bounded by the CALENDAR, not the data. Spark executes
    * a recursive CTE as one re-planned job PER ITERATION, so recursion
    * depth is the cost driver regardless of row counts: recursing month
    * by month (~80 iterations for this span) measured 11.5 s at sf0.1
    * while the SAME series generated by recursing on YEARS (~7
    * iterations) crossed with a 12-month inline table is ~1 s — depth
    * must grow with log/coarse units, never fine-grained ones, when the
    * engine re-plans per step. The SQL text is dialect-neutral (EXTRACT,
    * %, floor, inline VALUES, decimal money path) and runs VERBATIM in
    * both engines — logic parity is the contract.
    */
  val recursiveCalendarSql: String =
    """WITH RECURSIVE b AS (
      |  SELECT CAST(MIN(EXTRACT(YEAR FROM o_orderdate)) AS INT) AS ylo,
      |         CAST(MAX(EXTRACT(YEAR FROM o_orderdate)) AS INT) AS yhi,
      |         CAST(MIN(EXTRACT(YEAR FROM o_orderdate) * 12 +
      |              EXTRACT(MONTH FROM o_orderdate) - 1) AS INT) AS lo,
      |         CAST(MAX(EXTRACT(YEAR FROM o_orderdate) * 12 +
      |              EXTRACT(MONTH FROM o_orderdate) - 1) AS INT) AS hi
      |  FROM orders),
      |y(yr) AS (
      |  SELECT ylo FROM b
      |  UNION ALL
      |  SELECT yr + 1 FROM y, b WHERE yr < yhi),
      |grid AS (
      |  SELECT yr * 12 + v.m - 1 AS idx
      |  FROM y CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6),
      |    (7), (8), (9), (10), (11), (12)) AS v(m)),
      |bounded AS (SELECT idx FROM grid, b WHERE idx BETWEEN b.lo AND b.hi),
      |rev AS (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12 +
      |         EXTRACT(MONTH FROM o_orderdate) - 1 AS INT) AS idx,
      |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
      |      AS revenue
      |  FROM orders GROUP BY 1)
      |SELECT bounded.idx AS month_idx,
      |  CAST(floor(bounded.idx / 12) AS INT) AS year,
      |  CAST(bounded.idx % 12 + 1 AS INT) AS month,
      |  COALESCE(rev.revenue, 0.0) AS revenue
      |FROM bounded LEFT JOIN rev ON rev.idx = bounded.idx
      |ORDER BY month_idx""".stripMargin

  /** TPC-H Q11 shape: parts whose revenue exceeds a global-share
    * threshold — a scalar subquery in HAVING. Catalyst must plan the
    * subquery as ONE independent aggregate broadcast into the having
    * filter, never a per-group re-execution. The threshold comparison is
    * decimal-vs-decimal (both sums exact, 0.001 parses as an exact
    * decimal literal in both dialects), so the HAVING boundary has no
    * floating-point ambiguity. Shared verbatim text: Spark executes this
    * SQL directly and DuckDB grades the identical string.
    */
  val revenueShareSql: String =
    """SELECT l_partkey,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |GROUP BY l_partkey
      |HAVING SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) >
      |  (SELECT SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |     AS DECIMAL(18,4))) * 0.001 FROM lineitem)
      |ORDER BY revenue DESC, l_partkey""".stripMargin

  /** TPC-H Q22 shape: high-balance customers who have gone QUIET — above
    * the average positive balance (scalar subquery threshold) with no
    * order since 2000 (correlated NOT EXISTS → LeftAnti join), rolled up
    * by nation. The threshold is an exact decimal sum divided once in
    * double (identical on both engines); the anti join's date predicate
    * pushes to the orders scan. Complements q126 (EXISTS/semi) and q136
    * (semi+anti on suppliers) with the anti + scalar-threshold + rollup
    * composition.
    */
  val lapsedCustomersSql: String =
    """WITH thr AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)))
      |    AS DOUBLE) / COUNT(*) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
      |    AS totacctbal
      |FROM customer c
      |WHERE c.c_acctbal > (SELECT avg_bal FROM thr)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** TPC-H Q15 shape: the top supplier(s) by lineitem revenue — a scalar
    * MAX subquery over a DERIVED aggregate (the CTE appears as both join
    * input and subquery source). Revenue stays decimal through the
    * equality test, so the "ties keep every winner" contract is exact,
    * never a double ULP lottery.
    */
  val topSupplierSql: String =
    """WITH rev AS (SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
      |      AS total_rev
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name,
      |  CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_rev
      |FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
      |WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
      |ORDER BY s.s_suppkey""".stripMargin

  /** TPC-H Q13 shape: the distribution of orders-per-customer INCLUDING
    * the zero class — the left-outer count that q159's lineitem-only
    * frequency-of-frequencies cannot see (an order with no lines, a
    * customer with no orders, simply vanish from an inner-join count).
    * The priority filter lives in the JOIN CONDITION, not a WHERE — a
    * WHERE on the right side after the join would silently turn the
    * outer join back into an inner one for filtered customers.
    *
    * Scale shape: one shuffle pair on the customer key for the outer
    * join, then two chained aggregations — the second runs over the
    * already-collapsed per-customer frame and its key cardinality is
    * the max order count per customer (tiny at any scale).
    */
  def custOrderDist(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.where(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  private val custOrderDistOracle: String =
    """WITH c AS (
      |  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      |  FROM customer c
      |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |    AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey)
      |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM c GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q19 shape: revenue from three disjoint (brand, size-band,
    * quantity-band) channels — ONE join predicate that is an OR of ANDs
    * mixing columns from both sides. This is the CNF-pushdown stress:
    * the optimizer must factor the part-only conjuncts out of the
    * disjunction and push `(brand=12 AND size<=5) OR (brand=23 AND
    * size<=10) OR ...` below the join into the part scan, or every
    * lineitem row joins against the full part table before any
    * filtering. PlanSpec pins the part-side pushdown; the SQL text runs
    * verbatim in both engines.
    */
  val disjunctiveBandsSql: String =
    """SELECT
      |  CAST(ROUND(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
      |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
      |       AND l.l_quantity BETWEEN 1 AND 11)
      |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
      |       AND l.l_quantity BETWEEN 10 AND 20)
      |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
      |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q9 shape: profit roll-up by supplier nation and order year
    * over LIKE-filtered parts. The schema has no partsupp, so unit cost
    * is proxied as 60% of the part's retail price — the shape under
    * grading is the 4-table star join with a mixed-side profit
    * expression, not the cost model. Scale shape: part (LIKE-filtered),
    * supplier and nation broadcast; lineitem⋈orders is the one real
    * shuffle, on the order key; the (nation, year) group-by frame is
    * dimension×calendar bounded.
    */
  val profitRollupSql: String =
    """SELECT n.n_name AS nation,
      |  CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
      |  CAST(ROUND(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
      |    - 0.6 * p.p_retailprice * l.l_quantity
      |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q20 shape: suppliers who DOMINATE a part's shipped volume —
    * a nested IN (name-filtered part keys) inside an IN over a derived
    * per-(supplier, part) aggregate, gated by a scalar subquery
    * CORRELATED to that derived table (15% of the part's total volume —
    * calibrated so the dominant tier is non-empty at sf0.01, where a
    * part's lines spread across many suppliers).
    * The remaining decorrelation class after q126/q127/q136/q154/q155:
    * Catalyst must rewrite the correlated threshold into a per-part
    * aggregate joined back, and both INs into semi joins — no
    * per-outer-row re-execution. Quantities are integer-valued doubles,
    * so every sum is exact and the 0.15x compare cannot straddle a
    * rounding boundary.
    */
  val dominantSupplierSql: String =
    """SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |WHERE s.s_suppkey IN (
      |  SELECT sp.l_suppkey FROM (
      |    SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
      |    FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part
      |                        WHERE p_name LIKE 'blue%')
      |    GROUP BY l_suppkey, l_partkey) sp
      |  WHERE sp.qty > (SELECT 0.15 * SUM(l2.l_quantity)
      |                  FROM lineitem l2
      |                  WHERE l2.l_partkey = sp.l_partkey))
      |ORDER BY s.s_suppkey""".stripMargin

  /** Snapshot diff (q194): classify every key across two table versions
    * as added / removed / changed / unchanged, with per-column change
    * counts — the validation primitive behind CDC reconciliation and
    * "what did this backfill actually touch" audits. The comparison is
    * null-safe per column (a null never hides a change).
    *
    * Scale shape: ONE co-partitioned shuffle pair (full outer join on
    * the key — with both versions bucketed on the key, q62's layout,
    * zero exchanges); the classification and per-column counts are
    * row-local CASE arithmetic that combines map-side. The "new"
    * version here derives deterministically from orders (drop keys
    * ≡0 mod 97, bump price on ≡0 mod 101, re-key a ≡0 mod 103 slice
    * +90M as inserts) so both engines construct bit-identical inputs.
    */
  def snapshotDiff(oldV: DataFrame, newV: DataFrame): DataFrame = {
    val o = oldV.select(col("o_orderkey").as("k"),
      col("o_totalprice").as("old_price"),
      col("o_orderstatus").as("old_status"),
      col("o_orderpriority").as("old_prio"))
    val n = newV.select(col("o_orderkey").as("k"),
      col("o_totalprice").as("new_price"),
      col("o_orderstatus").as("new_status"),
      col("o_orderpriority").as("new_prio"))
    o.join(n, Seq("k"), "full_outer")
      .select(
        when(col("old_price").isNull && col("old_status").isNull &&
          col("old_prio").isNull, "added")
          .when(col("new_price").isNull && col("new_status").isNull &&
            col("new_prio").isNull, "removed")
          .when(col("old_price") <=> col("new_price") &&
            col("old_status") <=> col("new_status") &&
            col("old_prio") <=> col("new_prio"), "unchanged")
          .otherwise("changed").as("class"),
        (!(col("old_price") <=> col("new_price"))).cast("long").as("d_price"),
        (!(col("old_status") <=> col("new_status"))).cast("long").as("d_status"),
        (!(col("old_prio") <=> col("new_prio"))).cast("long").as("d_prio"))
      .groupBy("class")
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("class") === "changed", col("d_price")).otherwise(0L))
          .as("price_changes"),
        sum(when(col("class") === "changed", col("d_status")).otherwise(0L))
          .as("status_changes"),
        sum(when(col("class") === "changed", col("d_prio")).otherwise(0L))
          .as("prio_changes"))
      .orderBy("class")
  }

  /** The deterministic "version 2" of orders both engines derive. */
  def mutatedOrders(orders: DataFrame): DataFrame =
    orders.where(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 101 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      .unionByName(
        orders.where(col("o_orderkey") % 103 === 0)
          .select((col("o_orderkey") + 90000000L).as("o_orderkey"),
            col("o_totalprice"), col("o_orderstatus"), col("o_orderpriority")))

  private val snapshotDiffOracle: String =
    """WITH newv AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus, o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 != 0
      |  UNION ALL
      |  SELECT o_orderkey + 90000000, o_totalprice, o_orderstatus,
      |    o_orderpriority
      |  FROM orders WHERE o_orderkey % 103 = 0),
      |j AS (
      |  SELECT
      |    CASE
      |      WHEN o.o_orderkey IS NULL THEN 'added'
      |      WHEN n.o_orderkey IS NULL THEN 'removed'
      |      WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
      |       AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
      |       AND o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority
      |        THEN 'unchanged'
      |      ELSE 'changed' END AS class,
      |    CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
      |      THEN 1 ELSE 0 END AS d_price,
      |    CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
      |      THEN 1 ELSE 0 END AS d_status,
      |    CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
      |      THEN 1 ELSE 0 END AS d_prio
      |  FROM orders o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey)
      |SELECT class, CAST(COUNT(*) AS BIGINT) AS n_keys,
      |  CAST(SUM(CASE WHEN class = 'changed' THEN d_price ELSE 0 END)
      |    AS BIGINT) AS price_changes,
      |  CAST(SUM(CASE WHEN class = 'changed' THEN d_status ELSE 0 END)
      |    AS BIGINT) AS status_changes,
      |  CAST(SUM(CASE WHEN class = 'changed' THEN d_prio ELSE 0 END)
      |    AS BIGINT) AS prio_changes
      |FROM j GROUP BY class ORDER BY class""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q194_table_diff",
      Some(snapshotDiffOracle),
      (spark, dir) => {
        val o = t(spark, dir, "orders")
        snapshotDiff(o, mutatedOrders(o))
      }),

    QueryDef(
      "q162_cust_order_dist",
      Some(custOrderDistOracle),
      (spark, dir) => custOrderDist(
        t(spark, dir, "customer"), t(spark, dir, "orders"))),

    QueryDef(
      "q163_disjunctive_bands",
      Some(disjunctiveBandsSql),
      (spark, dir) => {
        withViews(spark, dir, "lineitem", "part")
        spark.sql(disjunctiveBandsSql)
      }),

    QueryDef(
      "q164_profit_rollup",
      Some(profitRollupSql),
      (spark, dir) => {
        withViews(spark, dir, "lineitem", "part", "supplier", "nation", "orders")
        spark.sql(profitRollupSql)
      }),

    QueryDef(
      "q165_dominant_supplier",
      Some(dominantSupplierSql),
      (spark, dir) => {
        withViews(spark, dir, "supplier", "lineitem", "part")
        spark.sql(dominantSupplierSql)
      }),

    QueryDef(
      "q154_lapsed_customers",
      Some(lapsedCustomersSql),
      (spark, dir) => {
        withViews(spark, dir, "customer", "orders")
        spark.sql(lapsedCustomersSql)
      }),

    QueryDef(
      "q155_top_supplier",
      Some(topSupplierSql),
      (spark, dir) => {
        withViews(spark, dir, "supplier", "lineitem")
        spark.sql(topSupplierSql)
      }),

    QueryDef(
      "q149_revenue_share_having",
      Some(revenueShareSql),
      (spark, dir) => {
        withViews(spark, dir, "lineitem")
        spark.sql(revenueShareSql)
      }),

    QueryDef(
      "q126_exists_subquery",
      Some(existsPriorityOracle),
      (spark, dir) => {
        withViews(spark, dir, "orders", "lineitem")
        spark.sql(existsPrioritySql)
      }),

    QueryDef(
      "q127_scalar_subquery",
      Some(smallQtyRevenueSql),
      (spark, dir) => {
        withViews(spark, dir, "lineitem", "part")
        spark.sql(smallQtyRevenueSql)
      }),

    QueryDef(
      "q136_sole_late_supplier",
      Some(soleLateSupplierOracle),
      (spark, dir) => {
        withViews(spark, dir, "supplier", "lineitem", "orders")
        spark.sql(soleLateSupplierSql)
      }),

    QueryDef(
      "q138_recursive_calendar",
      Some(recursiveCalendarSql),
      (spark, dir) => {
        withViews(spark, dir, "orders")
        spark.sql(recursiveCalendarSql)
      }),

    QueryDef(
      "q137_partition_checksum",
      Some(partitionChecksumOracle),
      (spark, dir) => partitionChecksum(t(spark, dir, "orders"))),

    QueryDef(
      "q128_market_share",
      Some(marketShareOracle),
      (spark, dir) => marketShare(
        t(spark, dir, "lineitem"), t(spark, dir, "orders"),
        t(spark, dir, "customer"), t(spark, dir, "supplier"),
        t(spark, dir, "part"), t(spark, dir, "nation"),
        t(spark, dir, "region"))))
}
