package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Data-governance audits (SURVEY §7.4 extension tier): referential
  * integrity, activity streaks, and a k-anonymity re-identification
  * risk report. The reference pipeline trusts its inputs implicitly;
  * these are the checks a 100 TB lake runs before (and after) every
  * load, expressed as the same graded-query shape as the rest of the
  * engine.
  *
  * Scale shapes: every audit below reduces the fact side to per-key
  * partial aggregates before any join (the wire carries one row per
  * distinct key, never the fact table), joins on 8-byte keys, and
  * emits dimension-bounded outputs (relationships, users, nations).
  */
object AuditOps {

  /** One relationship's two-directional integrity profile: child-side
    * orphans (FK rows with no parent — load-order or deletion bugs) AND
    * parent-side childless keys (coverage holes — the direction that is
    * non-trivially populated on healthy data, so the audit never grades
    * vacuously). The child collapses to (key, n) partials map-side; the
    * full-outer join then moves one row per distinct key.
    */
  def relationshipAudit(
      rel: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String): DataFrame = {
    val c = child.groupBy(col(childKey).cast("long").as("ck"))
      .agg(count(lit(1)).as("n"))
    val p = parent.select(col(parentKey).cast("long").as("pk")).distinct()
    c.join(p, col("ck") === col("pk"), "full_outer")
      .agg(
        coalesce(sum(col("n")), lit(0L)).cast("long").as("child_rows"),
        count(col("ck")).as("child_keys"),
        coalesce(sum(when(col("pk").isNull, col("n"))), lit(0L))
          .cast("long").as("orphan_rows"),
        count(col("pk")).as("parent_keys"),
        count(when(col("ck").isNull, col("pk"))).as("childless_parents"))
      .select(lit(rel).as("relationship"), col("child_rows"),
        col("child_keys"), col("orphan_rows"), col("parent_keys"),
        col("childless_parents"))
  }

  /** q208 body: the four FK relationships of the star schema audited in
    * one report. Each relationship is an independent branch (they union
    * as 4 one-row frames), so a cluster runs them concurrently.
    */
  def integrityAudit(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      part: DataFrame,
      events: DataFrame): DataFrame =
    relationshipAudit("events->customer", events, "user_id", customer, "c_custkey")
      .unionByName(relationshipAudit(
        "lineitem->orders", lineitem, "l_orderkey", orders, "o_orderkey"))
      .unionByName(relationshipAudit(
        "lineitem->part", lineitem, "l_partkey", part, "p_partkey"))
      .unionByName(relationshipAudit(
        "orders->customer", orders, "o_custkey", customer, "c_custkey"))
      .orderBy("relationship")

  private def relAuditSql(
      rel: String, child: String, childKey: String,
      parent: String, parentKey: String): String =
    s"""SELECT '$rel' AS relationship,
       |  CAST(COALESCE(SUM(n), 0) AS BIGINT) AS child_rows,
       |  CAST(COUNT(ck) AS BIGINT) AS child_keys,
       |  CAST(COALESCE(SUM(CASE WHEN pk IS NULL THEN n END), 0) AS BIGINT)
       |    AS orphan_rows,
       |  CAST(COUNT(pk) AS BIGINT) AS parent_keys,
       |  CAST(COUNT(CASE WHEN ck IS NULL THEN pk END) AS BIGINT)
       |    AS childless_parents
       |FROM (SELECT CAST($childKey AS BIGINT) AS ck, COUNT(*) AS n
       |      FROM $child GROUP BY 1) c
       |FULL OUTER JOIN (SELECT DISTINCT CAST($parentKey AS BIGINT) AS pk
       |      FROM $parent) p ON c.ck = p.pk""".stripMargin

  private val integrityOracle: String =
    Seq(
      relAuditSql("events->customer", "events", "user_id", "customer", "c_custkey"),
      relAuditSql("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      relAuditSql("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      relAuditSql("orders->customer", "orders", "o_custkey", "customer", "c_custkey"))
      .map(s => s"($s)")
      .mkString("", "\nUNION ALL\n", "\nORDER BY relationship")

  /** q209 body: longest consecutive-day activity streak per user —
    * classic gaps-and-islands via the epoch-day-minus-row-number anchor
    * (consecutive days share an anchor; any gap starts a new island).
    * The windows partition by user and run over the user's DISTINCT
    * ACTIVE DAYS (calendar-bounded — ≤ days-of-history rows per user,
    * never the raw event stream, which the first distinct collapses).
    */
  def activityStreaks(ev: DataFrame): DataFrame = {
    val days = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val byDay = Window.partitionBy("user_id").orderBy("day")
    val streaks = days
      .withColumn("anchor",
        datediff(col("day"), lit("1970-01-01").cast("date"))
          - row_number().over(byDay))
      .groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("streak_days"),
        min(col("day")).as("s"), max(col("day")).as("e"))
    val best = Window.partitionBy("user_id")
      .orderBy(col("streak_days").desc, col("s").asc)
    streaks.withColumn("rn", row_number().over(best)).where(col("rn") === 1)
      .select(col("user_id"), col("streak_days"),
        date_format(col("s"), "yyyy-MM-dd").as("streak_start"),
        date_format(col("e"), "yyyy-MM-dd").as("streak_end"))
      .orderBy(col("streak_days").desc, col("user_id"))
  }

  private val streaksOracle: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |anch AS (
      |  SELECT user_id, day,
      |    (day - DATE '1970-01-01')
      |      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS anchor
      |  FROM days),
      |streaks AS (
      |  SELECT user_id, anchor, COUNT(*) AS streak_days,
      |    MIN(day) AS s, MAX(day) AS e
      |  FROM anch GROUP BY 1, 2),
      |best AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |    ORDER BY streak_days DESC, s ASC) AS rn
      |  FROM streaks)
      |SELECT user_id, CAST(streak_days AS BIGINT) AS streak_days,
      |  STRFTIME(s, '%Y-%m-%d') AS streak_start,
      |  STRFTIME(e, '%Y-%m-%d') AS streak_end
      |FROM best WHERE rn = 1
      |ORDER BY streak_days DESC, user_id""".stripMargin

  /** q210 body: k-anonymity risk per nation over the quasi-identifier
    * (nation, market segment, $1000 balance band) — the privacy audit a
    * training-data release runs before shipping user-derived tables. A
    * row is at risk when its QI group has fewer than `k` members (it
    * narrows re-identification to < k candidates). All-integer counts;
    * the risk share is exact basis points via integer division. Two
    * chained aggregates (QI groups, then nation roll-up) — the fact
    * table shuffles once on the QI key, partial-agged map-side; the
    * nation join broadcasts.
    */
  def kAnonymity(customer: DataFrame, nation: DataFrame, k: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val groups = customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("int").as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("gsize"))
    val perNation = groups.groupBy("c_nationkey")
      .agg(sum(col("gsize")).cast("long").as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("gsize") < k, 1L).otherwise(0L)).cast("long").as("small_groups"),
        sum(when(col("gsize") < k, col("gsize")).otherwise(0L))
          .cast("long").as("at_risk_rows"))
    perNation.join(broadcast(nation),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("n_rows"), col("n_groups"),
        col("small_groups"), col("at_risk_rows"),
        expr("at_risk_rows * 10000 div n_rows").as("risk_bp"))
      .orderBy(col("risk_bp").desc, col("nation"))
  }

  private val kAnonymityOracle: String =
    """WITH qi AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal / 1000.0) AS INT) AS bal_band
      |  FROM customer),
      |g AS (
      |  SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS gsize
      |  FROM qi GROUP BY 1, 2, 3),
      |pn AS (
      |  SELECT c_nationkey, SUM(gsize) AS n_rows, COUNT(*) AS n_groups,
      |    SUM(CASE WHEN gsize < 5 THEN 1 ELSE 0 END) AS small_groups,
      |    SUM(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) AS at_risk_rows
      |  FROM g GROUP BY 1)
      |SELECT n.n_name AS nation, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(n_groups AS BIGINT) AS n_groups,
      |  CAST(small_groups AS BIGINT) AS small_groups,
      |  CAST(at_risk_rows AS BIGINT) AS at_risk_rows,
      |  CAST(at_risk_rows * 10000 // n_rows AS BIGINT) AS risk_bp
      |FROM pn JOIN nation n ON n.n_nationkey = pn.c_nationkey
      |ORDER BY risk_bp DESC, nation""".stripMargin

  /** q222 body: temporal train/test split + entity-leakage report —
    * the time-series ML hygiene check (q64/q119 split by hash/cluster;
    * time-based evaluation must split by DATE, and then needs to know
    * how many entities straddle the fence). One fact scan: per-customer
    * train/test order counts, then one roll-up — n orders and distinct
    * customers per side, customers on both, and the share of test
    * customers already seen in train (exact basis points; for
    * forecasting that overlap is expected — the audit quantifies it,
    * for cold-start evaluation it is the contamination number). Cutoff
    * = min order date + `cutoffDays`, a broadcast scalar.
    */
  def temporalSplitAudit(orders: DataFrame, cutoffDays: Int = 1460): DataFrame = {
    require(cutoffDays > 0, s"cutoffDays must be positive, got $cutoffDays")
    val cut = orders.agg(
      date_add(min(to_date(col("o_orderdate"))), cutoffDays).as("cut"))
    val perCust = orders.crossJoin(broadcast(cut))
      .groupBy("o_custkey")
      .agg(
        sum(when(to_date(col("o_orderdate")) < col("cut"), 1L).otherwise(0L))
          .as("n_train"),
        sum(when(to_date(col("o_orderdate")) >= col("cut"), 1L).otherwise(0L))
          .as("n_test"))
    perCust.agg(
      sum(col("n_train")).cast("long").as("train_orders"),
      sum(col("n_test")).cast("long").as("test_orders"),
      sum(when(col("n_train") > 0, 1L).otherwise(0L)).cast("long")
        .as("train_customers"),
      sum(when(col("n_test") > 0, 1L).otherwise(0L)).cast("long")
        .as("test_customers"),
      sum(when(col("n_train") > 0 && col("n_test") > 0, 1L).otherwise(0L))
        .cast("long").as("both_customers"))
      .withColumn("seen_in_train_bp",
        // Guard the degenerate empty-test-side case (cutoff at/after the
        // data span): ANSI-off Spark div would return NULL while DuckDB's
        // // 0 raises — NULLIF makes both engines agree on NULL.
        expr("both_customers * 10000 div nullif(test_customers, 0)"))
  }

  private val temporalSplitOracle: String =
    """WITH cutoff AS (
      |  SELECT MIN(CAST(o_orderdate AS DATE)) + 1460 AS cut FROM orders),
      |pc AS (
      |  SELECT o_custkey,
      |    SUM(CASE WHEN CAST(o_orderdate AS DATE) < cut THEN 1 ELSE 0 END)
      |      AS n_train,
      |    SUM(CASE WHEN CAST(o_orderdate AS DATE) >= cut THEN 1 ELSE 0 END)
      |      AS n_test
      |  FROM orders, cutoff GROUP BY o_custkey)
      |SELECT CAST(SUM(n_train) AS BIGINT) AS train_orders,
      |  CAST(SUM(n_test) AS BIGINT) AS test_orders,
      |  CAST(SUM(CASE WHEN n_train > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS train_customers,
      |  CAST(SUM(CASE WHEN n_test > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS test_customers,
      |  CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS both_customers,
      |  CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END)
      |    * 10000 // NULLIF(SUM(CASE WHEN n_test > 0 THEN 1 ELSE 0 END), 0)
      |    AS BIGINT) AS seen_in_train_bp
      |FROM pc""".stripMargin

  /** q223 body: declarative data contracts — a deequ-style constraint
    * pass where every contract is a row-level SQL predicate and the
    * whole suite runs in ONE corpus scan (a single wide aggregate, one
    * violation counter per contract, stacked to rows afterwards) — at
    * 100 TB the difference between a nightly quality gate and N full
    * scans. A violation is any row where the predicate is not TRUE
    * (NULL counts as a violation — unknown is not a pass). Contracts
    * are dialect-neutral SQL so the DuckDB oracle evaluates the same
    * text.
    */
  def contractAudit(df: DataFrame, contracts: Seq[(String, String)]): DataFrame = {
    require(contracts.nonEmpty, "contractAudit: need at least one contract")
    require(contracts.map(_._1).distinct.size == contracts.size,
      "contractAudit: contract names must be unique")
    // names are interpolated into the stack() expression and into
    // column aliases — restrict to identifiers so a quote/comma can't
    // break the parse (or inject into the plan)
    contracts.foreach { case (name, _) =>
      require(name.matches("[A-Za-z][A-Za-z0-9_]*"),
        s"contractAudit: contract name must be an identifier, got '$name'")
    }
    val counters = count(lit(1)).as("n_rows") +:
      contracts.map { case (name, pred) =>
        sum(when(coalesce(expr(pred), lit(false)), 0L).otherwise(1L))
          .as(s"v_$name")
      }
    val wide = df.agg(counters.head, counters.tail: _*)
    // stack (not a union of selects) so the whole suite is ONE plan
    // over ONE scan — a union would re-execute the aggregate per branch
    val stackArgs = contracts
      .map { case (name, _) => s"'$name', n_rows, v_$name" }
      .mkString(", ")
    wide.selectExpr(
      s"stack(${contracts.size}, $stackArgs) AS (contract, n_rows, n_violations)")
      .orderBy("contract")
  }

  /** The graded customer contract suite (q223): one deliberately
    * failing range contract (negative balances exist) keeps the
    * violation path non-vacuous.
    */
  val customerContracts: Seq[(String, String)] = Seq(
    ("acctbal_nonneg", "c_acctbal >= 0"),
    ("acctbal_range", "c_acctbal BETWEEN -1000 AND 10000"),
    ("custkey_notnull", "c_custkey IS NOT NULL"),
    ("name_prefix", "c_name LIKE 'Customer#%'"),
    ("nationkey_domain", "c_nationkey BETWEEN 0 AND 24"))

  private val contractOracle: String = {
    val wide = customerContracts.map { case (name, pred) =>
      s"SUM(CASE WHEN COALESCE($pred, FALSE) THEN 0 ELSE 1 END) AS v_$name"
    }.mkString(",\n    ")
    val rows = customerContracts.map { case (name, _) =>
      s"SELECT '$name' AS contract, n_rows, CAST(v_$name AS BIGINT) AS n_violations FROM a"
    }.mkString("\nUNION ALL ")
    s"""WITH a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    $wide
       |  FROM customer)
       |$rows
       |ORDER BY contract""".stripMargin
  }

  /** q230 body: telemetry debounce — drop events that repeat the same
    * (user, type) within `gapSeconds` of the PREVIOUS event (lag-based
    * suppression: double-clicks, retry storms, duplicate beacons). The
    * time-local dedup primitive next to the content dedups (q23/q24):
    * keyed on behavior, not content, and windowed per (user, type) —
    * bounded per-key frames, exact microsecond gap arithmetic. Reports
    * per event type: raw count, kept count, kept share in basis points.
    */
  def debounceStats(ev: DataFrame, gapSeconds: Int = 5): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("us", expr("unix_micros(ts)"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("keep",
        col("prev_us").isNull ||
          col("us") - col("prev_us") >= lit(gapSeconds * 1000000L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_kept"))
      .withColumn("kept_bp", expr("n_kept * 10000 div n_events"))
      .orderBy("event_type")
  }

  private val debounceOracle: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS us,
      |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS prev_us
      |  FROM events)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us >= 5000000
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us >= 5000000
      |    THEN 1 ELSE 0 END) * 10000
      |    // COUNT(*) AS BIGINT) AS kept_bp
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q232 body: calendar-gap audit — days inside the observed date
    * range with ZERO orders (a silent upstream outage looks exactly
    * like this; nobody notices absence without a calendar spine). The
    * spine is a bounded `sequence(min, max)` explode (one row per day
    * — q100's densification doctrine), the observed set is a distinct
    * date aggregate, and the gap report is a broadcast anti join.
    */
  def calendarGaps(orders: DataFrame): DataFrame = {
    // ONE orders scan: the distinct-day relation is the only fact pass
    // (checkpointed — it is at most days-of-history rows); bounds and
    // the spine derive from it, expected-day count is pure date
    // arithmetic, and observed = expected - missing (every observed day
    // lies inside [lo, hi] by construction)
    val observed = orders.select(to_date(col("o_orderdate")).as("day"))
      .distinct().localCheckpoint()
    val bounds = observed.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = bounds
      .select(col("lo"), col("hi"),
        explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    spine.join(observed, Seq("day"), "left_anti")
      .agg(
        count(lit(1)).as("n_missing"),
        min(date_format(col("day"), "yyyy-MM-dd")).as("first_missing"),
        max(date_format(col("day"), "yyyy-MM-dd")).as("last_missing"))
      .crossJoin(broadcast(bounds))
      .select(
        (datediff(col("hi"), col("lo")) + 1).cast("long").as("n_days_expected"),
        ((datediff(col("hi"), col("lo")) + 1).cast("long") - col("n_missing"))
          .as("n_days_observed"),
        col("n_missing"), col("first_missing"), col("last_missing"))
  }

  private val calendarGapsOracle: String =
    """WITH bounds AS (
      |  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
      |    MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders),
      |spine AS (
      |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
      |    AS day FROM bounds),
      |observed AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day
      |  FROM orders),
      |missing AS (
      |  SELECT day FROM spine
      |  WHERE day NOT IN (SELECT day FROM observed))
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM spine) AS n_days_expected,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM observed) AS n_days_observed,
      |  CAST(COUNT(*) AS BIGINT) AS n_missing,
      |  STRFTIME(MIN(day), '%Y-%m-%d') AS first_missing,
      |  STRFTIME(MAX(day), '%Y-%m-%d') AS last_missing
      |FROM missing""".stripMargin

  /** q265 body: right-to-erasure propagation audit. Given a delete
    * request set (customers keyed by custkey ≡ 13 mod 97 — a stand-in
    * for the compliance queue), report, per table in the star schema,
    * how many rows the purge removes and keeps: customer rows directly,
    * orders via o_custkey, lineitem transitively via the purged orders,
    * events via user_id. This is the blast-radius report a GDPR/CCPA
    * delete job emits BEFORE rewriting 100 TB — and running it again
    * after the rewrite (when all purged counts must be zero) is the
    * completion check.
    *
    * Scale shape: the request set is a small fraction of one dimension,
    * so every membership test is a BROADCAST semi-structure — customer/
    * orders/events never shuffle. The transitive lineitem step uses the
    * purged ORDER KEYS, which can outgrow a broadcast at full scale; it
    * is a plain (unhinted) semi-join there so AQE picks broadcast vs
    * shuffle by runtime size — the one join in the audit that is allowed
    * to shuffle, keyed on the 8-byte orderkey. Counts are conditional
    * aggregates over one scan per table; no purged copy is materialized.
    */
  def erasureAudit(
      customer: DataFrame,
      orders: DataFrame,
      lineitem: DataFrame,
      events: DataFrame): DataFrame = {
    val del = customer.where(col("c_custkey") % 97 === 13)
      .select(col("c_custkey").as("del_key"))
    def report(name: String, df: DataFrame, flag: org.apache.spark.sql.Column) =
      df.agg(
        count(lit(1)).as("rows_total"),
        sum(when(flag, 1L).otherwise(0L)).as("rows_purged"))
        .select(lit(name).as("table_name"), col("rows_total"),
          col("rows_purged"),
          (col("rows_total") - col("rows_purged")).as("rows_kept"))
    val custFlagged = report("customer", customer
      .join(broadcast(del), col("c_custkey") === col("del_key"), "left"),
      col("del_key").isNotNull)
    val ordFlagged = orders
      .join(broadcast(del), col("o_custkey") === col("del_key"), "left")
    val ordReport = report("orders", ordFlagged, col("del_key").isNotNull)
    val purgedOrders = ordFlagged.where(col("del_key").isNotNull)
      .select(col("o_orderkey").as("po_key"))
    val liReport = report("lineitem", lineitem
      .join(purgedOrders, col("l_orderkey") === col("po_key"), "left"),
      col("po_key").isNotNull)
    val evReport = report("events", events
      .join(broadcast(del), col("user_id") === col("del_key"), "left"),
      col("del_key").isNotNull)
    custFlagged.unionByName(ordReport).unionByName(liReport)
      .unionByName(evReport).orderBy("table_name")
  }

  private val erasureOracle: String =
    """WITH del AS (
      |  SELECT c_custkey AS del_key FROM customer WHERE c_custkey % 97 = 13),
      |po AS (
      |  SELECT o_orderkey FROM orders
      |  WHERE o_custkey IN (SELECT del_key FROM del))
      |SELECT * FROM (
      |  SELECT 'customer' AS table_name,
      |    CAST(COUNT(*) AS BIGINT) AS rows_total,
      |    CAST(COALESCE(SUM(CASE WHEN c_custkey IN (SELECT del_key FROM del)
      |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS rows_purged,
      |    CAST(COUNT(*) - COALESCE(SUM(CASE WHEN c_custkey IN
      |      (SELECT del_key FROM del) THEN 1 ELSE 0 END), 0) AS BIGINT)
      |      AS rows_kept
      |  FROM customer
      |  UNION ALL
      |  SELECT 'orders', CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM(CASE WHEN o_custkey IN (SELECT del_key FROM del)
      |      THEN 1 ELSE 0 END), 0) AS BIGINT),
      |    CAST(COUNT(*) - COALESCE(SUM(CASE WHEN o_custkey IN
      |      (SELECT del_key FROM del) THEN 1 ELSE 0 END), 0) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM po)
      |      THEN 1 ELSE 0 END), 0) AS BIGINT),
      |    CAST(COUNT(*) - COALESCE(SUM(CASE WHEN l_orderkey IN
      |      (SELECT o_orderkey FROM po) THEN 1 ELSE 0 END), 0) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'events', CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM(CASE WHEN user_id IN (SELECT del_key FROM del)
      |      THEN 1 ELSE 0 END), 0) AS BIGINT),
      |    CAST(COUNT(*) - COALESCE(SUM(CASE WHEN user_id IN
      |      (SELECT del_key FROM del) THEN 1 ELSE 0 END), 0) AS BIGINT)
      |  FROM events
      |) ORDER BY table_name""".stripMargin

  /** q284 body: the one-stop column profiler (ANALYZE TABLE / SUMMARIZE
    * equivalent) — per column: row count, null count, exact NDV, and
    * type-aware min/max (numerics as DOUBLE, strings as-is, timestamps
    * rendered on the fixed second grid so no engine's float-to-string
    * formatting enters the hash). The first query every onboarding
    * pipeline runs against an unknown table.
    *
    * Scale shape: one single-column aggregate per profiled column,
    * unioned — on columnar storage that is ONE logical pass (each scan
    * prunes to its own column; ReadSchema carries exactly one field), and
    * it sidesteps the 40+-expression wide aggregate that stalls Janino
    * (SURVEY §7.3's >16-column rule). Each partial agg combines map-side;
    * the union is |columns| one-row frames.
    */
  def columnProfile(df: DataFrame, numCols: Seq[String], strCols: Seq[String],
      tsCols: Seq[String]): DataFrame = {
    require(numCols.nonEmpty || strCols.nonEmpty || tsCols.nonEmpty,
      "profile at least one column")
    val nullS = lit(null).cast("string")
    val nullD = lit(null).cast("double")
    def base(c: String) = Seq(
      count(lit(1)).as("n_rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct(col(c)).as("ndv"))
    def one(c: String, mins: Seq[org.apache.spark.sql.Column]) =
      df.agg(base(c).head, (base(c).tail ++ mins): _*)
        .select(lit(c).as("column"), col("*"))
    val frames =
      numCols.map(c => one(c, Seq(
        min(col(c)).cast("double").as("min_num"),
        max(col(c)).cast("double").as("max_num"),
        nullS.as("min_str"), nullS.as("max_str")))) ++
      strCols.map(c => one(c, Seq(
        nullD.as("min_num"), nullD.as("max_num"),
        min(col(c)).as("min_str"), max(col(c)).as("max_str")))) ++
      tsCols.map(c => one(c, Seq(
        nullD.as("min_num"), nullD.as("max_num"),
        date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss").as("min_str"),
        date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss").as("max_str"))))
    frames.reduce(_.unionByName(_)).orderBy("column")
  }

  /** The graded lineitem profile set — every column of the fact table,
    * typed. ONE list drives both engines (the q180 doctrine). Declared
    * BEFORE the oracle text that maps over it (object init order).
    */
  private val ProfileNumCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val ProfileStrCols = Seq("l_returnflag", "l_linestatus")
  private val ProfileTsCols = Seq("l_shipdate")

  private val columnProfileSql: String = {
    def num(c: String) =
      s"""SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
         |  CAST(MIN($c) AS DOUBLE) AS min_num,
         |  CAST(MAX($c) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM lineitem""".stripMargin
    def str(c: String) =
      s"""SELECT '$c', CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(COUNT(DISTINCT $c) AS BIGINT),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  MIN($c), MAX($c)
         |FROM lineitem""".stripMargin
    def ts(c: String) =
      s"""SELECT '$c', CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(COUNT(DISTINCT $c) AS BIGINT),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  strftime(MIN($c), '%Y-%m-%d %H:%M:%S'),
         |  strftime(MAX($c), '%Y-%m-%d %H:%M:%S')
         |FROM lineitem""".stripMargin
    (ProfileNumCols.map(num) ++ ProfileStrCols.map(str) ++
      ProfileTsCols.map(ts)).mkString("", "\nUNION ALL\n", "\nORDER BY 1")
  }

  /** q322 body: TAMPER-EVIDENT lineage hash chains — per key, the
    * md5-fold over the event history in (ts, event_id) order, seeded by
    * the key itself: head_i = md5(head_{i−1} ∥ ':' ∥ event_id ∥ ':' ∥
    * event_type). One altered, dropped, reordered, or injected event
    * anywhere in a user's history changes the head (avalanche), so two
    * parties (producer and lake, or two replicas) can verify a 100 TB
    * changelog by exchanging |keys| hashes instead of rows — the
    * audit-tier counterpart of q137's order-free partition checksums,
    * for the case where ORDER is part of the contract (CDC streams,
    * event sourcing). AuditSpec pins the avalanche on flip / reorder /
    * drop and the chain arithmetic against an independent JVM fold.
    *
    * Scale shape: one user-keyed shuffle; each group folds its OWN
    * bounded history row-locally (collect_list + a strict ascending
    * HOF fold — per-key history is the bounded dimension here, exactly
    * the sessionization contract). The fold is order-DEPENDENT by
    * design, so the sort key (ts, event_id) is total and the oracle's
    * `list(… ORDER BY ts, event_id)` mirrors it; md5 is bit-identical
    * across engines, hence the full SQL oracle.
    */
  def lineageChains(ev: DataFrame): DataFrame = {
    val el = concat(lit(":"), col("event_id").cast("string"),
      lit(":"), coalesce(col("event_type"), lit("")))
    ev.select(col("user_id"), col("ts"), col("event_id"), el.as("el"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col("ts"), col("event_id"),
          col("el")))).as("evs"))
      .select(col("user_id"), col("n_events"),
        expr("""aggregate(evs, md5(CAST(user_id AS STRING)),
          |  (acc, e) -> md5(concat(acc, e.el)))""".stripMargin)
          .as("chain_head"))
      .orderBy("user_id")
  }

  private val lineageChainsSql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    ':' || CAST(event_id AS VARCHAR) || ':'
      |      || COALESCE(event_type, '') AS el
      |  FROM events),
      |g AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |    list_prepend(md5(CAST(user_id AS VARCHAR)),
      |      list(el ORDER BY ts, event_id)) AS l
      |  FROM e GROUP BY user_id)
      |SELECT user_id, n_events,
      |  list_reduce(l, (acc, x) -> md5(acc || x)) AS chain_head
      |FROM g ORDER BY user_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q322_lineage_chain", Some(lineageChainsSql),
      (spark, dir) => lineageChains(EventOps.events(spark, dir))),

    QueryDef("q284_column_profile", Some(columnProfileSql),
      (spark, dir) => columnProfile(t(spark, dir, "lineitem"),
        ProfileNumCols, ProfileStrCols, ProfileTsCols)),

    QueryDef("q265_erasure_audit", Some(erasureOracle),
      (spark, dir) => erasureAudit(
        t(spark, dir, "customer"), t(spark, dir, "orders"),
        t(spark, dir, "lineitem"), EventOps.events(spark, dir))),

    QueryDef("q230_debounce", Some(debounceOracle),
      (spark, dir) => debounceStats(EventOps.events(spark, dir))),

    QueryDef("q232_calendar_gaps", Some(calendarGapsOracle),
      (spark, dir) => calendarGaps(t(spark, dir, "orders"))),

    QueryDef("q222_temporal_split", Some(temporalSplitOracle),
      (spark, dir) => temporalSplitAudit(t(spark, dir, "orders"))),

    QueryDef("q223_data_contracts", Some(contractOracle),
      (spark, dir) => contractAudit(
        t(spark, dir, "customer"), customerContracts)),

    QueryDef("q208_integrity_audit", Some(integrityOracle),
      (spark, dir) => integrityAudit(
        t(spark, dir, "lineitem"), t(spark, dir, "orders"),
        t(spark, dir, "customer"), t(spark, dir, "part"),
        EventOps.events(spark, dir))),

    QueryDef("q209_activity_streaks", Some(streaksOracle),
      (spark, dir) => activityStreaks(EventOps.events(spark, dir))),

    QueryDef("q210_k_anonymity", Some(kAnonymityOracle),
      (spark, dir) => kAnonymity(
        t(spark, dir, "customer"), t(spark, dir, "nation"))))
}
