package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Relational-shape and scalar-function surface the other graded queries
  * don't exercise: wide->tall UNPIVOT (the inverse of q48's pivot),
  * higher-order array functions (lambda transform/filter/fold — the
  * codegen'd alternative to a UDF for per-row collection logic), the
  * date-arithmetic family, and null-safe equality joins. All four are
  * exactly SQL-expressible — full DuckDB oracles, no goldens.
  */
object ShapeOps {

  val defs: Seq[QueryDef] = Seq(
    // Welch two-sample t-statistic over deterministic cohorts (user_id
    // parity) with EXACT cents-integer moments — the q97 pattern applied
    // to the experimentation-analytics primitive: per-cohort n, Σx, Σx²
    // accumulate in DECIMAL (order-independent, engine-identical), one
    // conditional aggregation collapses both cohorts in a single
    // map-side-combined pass, and only the final mean/variance/t chain
    // runs in double — the SAME expression tree on both sides, so every
    // IEEE op rounds identically. Scan-speed at any scale.
    QueryDef(
      "q141_ab_ttest",
      Some("""WITH m AS (SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN CAST(round(value * 100) AS HUGEINT) ELSE 0 END) AS sxa,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN CAST(round(value * 100) AS HUGEINT) * CAST(round(value * 100) AS HUGEINT) ELSE 0 END) AS sxxa,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
        |    SUM(CASE WHEN user_id % 2 = 1 THEN CAST(round(value * 100) AS HUGEINT) ELSE 0 END) AS sxb,
        |    SUM(CASE WHEN user_id % 2 = 1 THEN CAST(round(value * 100) AS HUGEINT) * CAST(round(value * 100) AS HUGEINT) ELSE 0 END) AS sxxb
        |  FROM events)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) AS mean_cents_a,
        |  CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_cents_b,
        |  (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE))
        |    / sqrt(((CAST(na AS DOUBLE) * CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE))
        |              / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0))) / CAST(na AS DOUBLE)
        |         + ((CAST(nb AS DOUBLE) * CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE))
        |              / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))) / CAST(nb AS DOUBLE))
        |    AS t_stat
        |FROM m""".stripMargin),
      (spark, dir) => welchTTest(EventOps.events(spark, dir))),

    // SCD2 point-in-time lookup: the lakehouse join every fact pipeline
    // runs nightly — attach the dimension version that was ACTIVE at the
    // fact's event time, not today's. Composes q120's version build with
    // a user-keyed join whose interval predicate rides as a residual
    // condition. Timestamps stay at raw microsecond precision through
    // the join (strings would truncate to seconds and blur boundaries);
    // formatting happens only in the output projection.
    QueryDef(
      "q152_scd2_lookup",
      Some("""WITH c AS (SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (SELECT user_id, event_type, ts, event_id FROM c
        |  WHERE prev IS NULL OR event_type <> prev),
        |v AS (SELECT user_id, event_type AS state, ts AS valid_from,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM ch)
        |SELECT p.event_id, p.user_id, CAST(v.version AS INT) AS version,
        |  v.state,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |JOIN v ON p.user_id = v.user_id AND p.ts >= v.valid_from
        |      AND (v.valid_to IS NULL OR p.ts < v.valid_to)
        |ORDER BY p.event_id""".stripMargin),
      (spark, dir) => scd2Lookup(EventOps.events(spark, dir))),

    // UNPIVOT / melt — the inverse reshaping of q48's pivot, as the real
    // Dataset.unpivot operator (plans as a single Expand over the scan:
    // each row fans out to one row per measure with NO shuffle and no
    // join; column pruning still reaches the scan). Measures share one
    // double type, the id column rides along, and output order is pinned
    // by the unique (o_orderkey, metric) pair.
    QueryDef(
      "q87_unpivot",
      Some("""SELECT o_orderkey, metric, value FROM (
        |  SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders)
        |ORDER BY o_orderkey, metric""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice").as("totalprice"),
            col("o_custkey").cast("double").as("custkey"))
          .unpivot(Array(col("o_orderkey")),
            Array(col("totalprice"), col("custkey")), "metric", "value")
          .orderBy("o_orderkey", "metric")),

    // Higher-order array functions over the tokenized corpus: lambda
    // filter / transform / aggregate (fold) — per-row collection logic
    // that stays inside whole-stage codegen instead of a UDF. Every
    // output is integer or string (token arithmetic), so the cross-engine
    // hash cannot drift on float representation. Scale shape: row-local,
    // scan-speed, zero shuffles beyond the presentation sort.
    QueryDef(
      "q88_array_hof",
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  CAST(len(l) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(l, x -> len(x) > 6)) AS BIGINT) AS n_long,
        |  CAST(list_sum(list_transform(l, x -> len(x))) AS BIGINT) AS sum_len,
        |  CAST(list_max(list_transform(l, x -> len(x))) AS BIGINT) AS max_len,
        |  upper(list_filter(l, x -> len(x) > 6)[1]) AS first_long_upper
        |FROM d ORDER BY doc_id""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "documents")
          .where(col("text").isNotNull)
          .select(col("doc_id"), split(col("text"), " ").as("l"))
          .select(col("doc_id"),
            size(col("l")).cast("long").as("n_tokens"),
            expr("size(filter(l, x -> length(x) > 6))").cast("long").as("n_long"),
            expr("aggregate(l, 0L, (acc, x) -> acc + length(x))").as("sum_len"),
            expr("array_max(transform(l, x -> length(x)))").cast("long").as("max_len"),
            // get() is 0-based and null-on-missing (element_at throws
            // under ANSI when no long token exists)
            expr("upper(get(filter(l, x -> length(x) > 6), 0))")
              .as("first_long_upper"))
          .orderBy("doc_id")),

    // Date-arithmetic family over the order calendar: add-days, diff-days,
    // month boundaries (trunc / last_day), quarter, and a PORTABLE
    // day-of-week (days since a pre-data Monday, mod 7 — both engines'
    // native dayofweek disagree on numbering, so the formula is the
    // cross-engine contract). Grouped to the distinct calendar first:
    // the per-date derivations run on ~365 rows, not the fact table.
    QueryDef(
      "q89_date_funcs",
      Some("""WITH c AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT d, n_orders,
        |  d + 30 AS plus30,
        |  CAST(DATE '2002-06-01' - d AS BIGINT) AS days_to_anchor,
        |  CAST(date_trunc('month', d) AS DATE) AS month_start,
        |  last_day(d) AS month_end,
        |  CAST(quarter(d) AS INT) AS q,
        |  CAST((d - DATE '1990-01-01') % 7 AS INT) AS dow_monday0
        |FROM c ORDER BY d""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("n_orders"))
          .select(col("d"), col("n_orders"),
            date_add(col("d"), 30).as("plus30"),
            datediff(lit("2002-06-01").cast("date"), col("d")).cast("long")
              .as("days_to_anchor"),
            trunc(col("d"), "MM").as("month_start"),
            last_day(col("d")).as("month_end"),
            quarter(col("d")).as("q"),
            pmod(datediff(col("d"), lit("1990-01-01").cast("date")), lit(7))
              .cast("int").as("dow_monday0"))
          .orderBy("d")),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): the join
    // class where NULL keys MATCH each other instead of vanishing —
    // needed whenever a derived key is legitimately null (here
    // NULLIF(status, 'F'): the F stratum becomes the null key). Both
    // sides pre-aggregate to one row per key before the join, so the
    // null-safe comparison runs over a handful of rows; at scale the
    // same plan shuffles on the key with nulls co-located (null-safe
    // equality hashes null as a regular value — no stray-null skew
    // beyond what the key distribution already has).
    QueryDef(
      "q90_nullsafe_join",
      Some(s"""WITH a AS (SELECT NULLIF(o_orderstatus, 'F') AS k,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1),
        |b AS (SELECT NULLIF(o_orderstatus, 'F') AS k,
        |    ${sqlMoneySum("o_totalprice")} AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT a.k, n_orders, revenue
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY a.k NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val o = t(spark, dir, "orders")
          .select(expr("NULLIF(o_orderstatus, 'F')").as("k"),
            col("o_totalprice"))
        val a = o.groupBy("k").agg(count(lit(1)).as("n_orders"))
        val b = o.groupBy(col("k").as("bk"))
          .agg(moneySum(col("o_totalprice")).as("revenue"))
        a.join(b, a("k") <=> b("bk"))
          .select(col("k"), col("n_orders"), col("revenue"))
          .orderBy(col("k").asc_nulls_first)
      }),

    // Pearson correlation with EXACT integer/decimal moments: the six
    // sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in DECIMAL — exact and
    // partition-order-independent, where a native corr() would drift on
    // double summation order between engines — and only the final
    // formula runs in double, written as the SAME expression tree on
    // both sides so the IEEE ops round identically. One map-side-combined
    // groupBy; scan-speed at any scale (the q77 outlier pattern applied
    // to bivariate statistics).
    QueryDef(
      "q97_corr_exact",
      Some("""WITH s AS (SELECT l_returnflag,
        |    CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(CAST(l_quantity AS HUGEINT)) AS sx,
        |    SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sy,
        |    SUM(CAST(l_quantity AS HUGEINT) * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sxy,
        |    SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS sxx,
        |    SUM(CAST(round(l_extendedprice * 100) AS HUGEINT) * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    AS corr_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin),
      (spark, dir) => {
        // integer moments: quantity is integral, price sits on a 2dp grid
        // -> cents; corr is scale-invariant, so the unit change is free
        // and every sum is exact (DECIMAL(38,0) here = HUGEINT there)
        val x = col("l_quantity").cast("decimal(38,0)")
        val y = round(col("l_extendedprice") * 100, 0).cast("decimal(38,0)")
        val s = t(spark, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
        def d(c: String) = col(c).cast("double")
        s.select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
            ((d("n") * d("sxy") - d("sx") * d("sy")) /
              sqrt((d("n") * d("sxx") - d("sx") * d("sx")) *
                (d("n") * d("syy") - d("sy") * d("sy")))).as("corr_qty_price"))
          .orderBy("l_returnflag")
      }),

    // CDC changelog compaction (keep-latest upsert semantics): treat the
    // event stream as a per-user changelog ordered by (ts, event_id),
    // keep each key's LATEST change, and drop keys whose latest change is
    // a delete ('error' here) — the compaction every CDC ingest runs
    // before serving a snapshot. One shuffle on the key; the window sort
    // is per-key and bounded by that key's change count, never global.
    // q237: the TPC-H Q6 shape — the purely conjunctive single-table
    // predicate + arithmetic aggregate ("revenue increase if discounts
    // were dropped"). The point at 100 TB is what the plan does NOT do:
    // no join, no window; all three predicates push to the parquet scan
    // and the decimal product sums map-side. Completes the TPC-H
    // predicate family next to q163's disjunctive OR-of-ANDs.
    QueryDef(
      "q237_discount_revenue",
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
        |    * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "lineitem")
          .where(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date")
            && to_date(col("l_shipdate")) < lit("1997-01-01").cast("date")
            && col("l_discount").between(0.05, 0.07)
            && col("l_quantity") < 24)
          .agg(count(lit(1)).as("n_lines"),
            round(sum(money(col("l_extendedprice")) * money(col("l_discount"))), 2)
              .cast("double").as("revenue"))),

    // q238: time travel over the CDC log — reconstruct the serving
    // snapshot AS OF mid-window (min_ts + 15 days) by bounding the
    // changelog at the cutoff and running the SAME keep-latest/tombstone
    // compaction as q98. The "what did the table look like on T" read a
    // warehouse answers from its changelog when the snapshot itself is
    // gone; the cutoff rides in as a broadcast scalar.
    QueryDef(
      "q238_asof_snapshot",
      Some("""WITH c AS (SELECT MIN(ts) + INTERVAL 15 DAY AS cut FROM events),
        |r AS (SELECT user_id, event_type, value, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events, c WHERE ts <= cut)
        |SELECT user_id, event_type AS last_type,
        |  CAST(value AS DOUBLE) AS last_value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin),
      (spark, dir) => {
        val ev = EventOps.events(spark, dir)
        val cut = ev.agg((min(col("ts"))
          + expr("INTERVAL 15 DAYS")).as("cut"))
        cdcCompact(ev.crossJoin(broadcast(cut))
          .where(col("ts") <= col("cut")))
      }),

    // q270: bitemporal restatement audit — see bitemporalAsof.
    QueryDef(
      "q270_bitemporal_asof",
      Some("""WITH b AS (
        |  SELECT MIN(ts) + INTERVAL 10 DAY AS v_cut,
        |    MIN(ts) + INTERVAL 11 DAY AS tx_cut
        |  FROM events),
        |ar AS (
        |  SELECT e.*, e.ts + (e.event_id % 5) * INTERVAL 1 DAY AS arrival_ts,
        |    b.v_cut, b.tx_cut
        |  FROM events e, b WHERE e.ts <= b.v_cut),
        |thn AS (
        |  SELECT user_id, event_type AS then_type,
        |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS then_ts
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM ar WHERE arrival_ts <= tx_cut)
        |  WHERE rn = 1 AND event_type <> 'error'),
        |nw AS (
        |  SELECT user_id, event_type AS now_type,
        |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS now_ts
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM ar)
        |  WHERE rn = 1 AND event_type <> 'error')
        |SELECT COALESCE(thn.user_id, nw.user_id) AS user_id,
        |  then_type, then_ts, now_type, now_ts,
        |  NOT (then_type IS NOT DISTINCT FROM now_type
        |    AND then_ts IS NOT DISTINCT FROM now_ts) AS revised
        |FROM thn FULL OUTER JOIN nw ON thn.user_id = nw.user_id
        |ORDER BY user_id""".stripMargin),
      (spark, dir) => bitemporalAsof(EventOps.events(spark, dir))),

    QueryDef(
      "q98_cdc_compact",
      Some("""WITH r AS (SELECT user_id, event_type, value, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type AS last_type,
        |  CAST(value AS DOUBLE) AS last_value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin),
      (spark, dir) => cdcCompact(EventOps.events(spark, dir))),

    // Batch-parity grade for the STREAMING upsert sink: replay the whole
    // event changelog through StreamingUpsert's foreachBatch serving-table
    // build — four hash-interleaved landing files forced through separate
    // micro-batches (maxFilesPerTrigger=1), so every batch carries events
    // from the full time range and the cross-batch merge + tombstone
    // ordering actually fires — then grade the final served table against
    // q98's CDC-compaction oracle. The continuous path and the batch path
    // must agree on the exact same snapshot; this graduates the upsert
    // sink from spec-pinned to oracle-graded.
    QueryDef(
      "q168_upsert_replay",
      Some("""WITH r AS (SELECT user_id, event_type, value, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type AS last_type,
        |  CAST(value AS DOUBLE) AS last_value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin),
      (spark, dir) => upsertReplay(spark, dir)),

    // Map-typed column surface: per-priority status->count map built with
    // map_from_entries over collect_list, consumed with size /
    // try_element_at (ANSI-safe on missing keys). The map stays inside
    // the engine; the graded output is scalar extractions, which the
    // oracle recomputes relationally — grading map SEMANTICS without
    // betting on cross-engine map codecs. Domain-bounded collect_list
    // (3 statuses), map-side combined.
    QueryDef(
      "q99_map_funcs",
      Some("""SELECT o_orderpriority,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS INT) AS n_statuses,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |  CAST(NULL AS BIGINT) AS n_missing_key
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "orders")
          .groupBy("o_orderpriority", "o_orderstatus")
          .agg(count(lit(1)).as("c"))
          .groupBy("o_orderpriority")
          .agg(map_from_entries(collect_list(struct(col("o_orderstatus"), col("c"))))
            .as("m"))
          .select(col("o_orderpriority"),
            size(col("m")).as("n_statuses"),
            expr("coalesce(try_element_at(m, 'O'), 0L)").as("n_open"),
            expr("coalesce(try_element_at(m, 'F'), 0L)").as("n_filled"),
            expr("try_element_at(m, 'ZZ')").as("n_missing_key"))
          .orderBy("o_orderpriority")),

    // Calendar densification: build the full (day x status) grid from the
    // data's own date bounds and left-join the daily aggregates so
    // missing cells surface as explicit zeros — the reporting step every
    // dashboard needs before charting (gaps read as zero, not absent).
    // Scale shape: the fact table is touched ONCE by a partial-agged
    // groupBy; everything after operates on calendar-bounded frames
    // (days x statuses), which stay tiny at ANY corpus scale, so the
    // cross join is a broadcast nested loop over ~10^3 rows by design.
    QueryDef(
      "q100_densify",
      Some(s"""WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS mn,
        |    MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders),
        |spine AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |dims AS (SELECT DISTINCT o_orderstatus AS status FROM orders),
        |f AS (SELECT CAST(o_orderdate AS DATE) AS day, o_orderstatus AS status,
        |    CAST(COUNT(*) AS BIGINT) AS n, ${sqlMoneySum("o_totalprice")} AS rev
        |  FROM orders GROUP BY 1, 2)
        |SELECT spine.day, dims.status,
        |  COALESCE(f.n, 0) AS n_orders, COALESCE(f.rev, 0.0) AS revenue
        |FROM spine CROSS JOIN dims
        |LEFT JOIN f ON f.day = spine.day AND f.status = dims.status
        |ORDER BY spine.day, dims.status""".stripMargin),
      (spark, dir) => {
        val o = t(spark, dir, "orders")
          .select(col("o_orderdate").cast("date").as("day"),
            col("o_orderstatus").as("status"), col("o_totalprice"))
        val spine = o.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
          .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
        val dims = o.select("status").distinct()
        val facts = o.groupBy("day", "status")
          .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("rev"))
        spine.crossJoin(dims)
          .join(facts, Seq("day", "status"), "left")
          .select(col("day"), col("status"),
            coalesce(col("n"), lit(0L)).as("n_orders"),
            coalesce(col("rev"), lit(0.0)).as("revenue"))
          .orderBy("day", "status")
      }),

    // RANGE window frame — the value-based frame class (q35/q81 grade only
    // row-based frames): per-customer trailing-30-day revenue, the
    // sliding-window balance every ledger/report needs. The frame is
    // keyed on integer epoch-days (both engines' RANGE semantics over
    // the same numeric domain, peer rows included identically), and the
    // sum is decimal-exact before the final rounding. The window
    // partitions by customer — per-partition bounded sorts, never a
    // global sort.
    QueryDef(
      "q101_range_frame",
      Some(s"""WITH o AS (SELECT o_orderkey, o_custkey,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1990-01-01' AS BIGINT) AS day_idx,
        |    o_totalprice
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, day,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE)
        |    AS trailing30_rev
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_idx
        |             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin),
      (spark, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("day_idx")
          .rangeBetween(-29, 0)
        t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate").cast("date").as("day"),
            datediff(col("o_orderdate").cast("date"), lit("1990-01-01").cast("date"))
              .cast("long").as("day_idx"),
            col("o_totalprice"))
          .withColumn("trailing30_rev",
            round(sum(money(col("o_totalprice"))).over(w), 2).cast("double"))
          .select("o_orderkey", "o_custkey", "day", "trailing30_rev")
          .orderBy("o_orderkey")
      }),

    // Regex function family — extract / replace / count with patterns
    // both engines' regex dialects (Java util.regex vs RE2) evaluate
    // identically: anchored capture groups, character classes, digit
    // runs. Row-local, codegen'd, scan-speed; the group-by bounds the
    // output by the (brand, first-token) domain, not the table.
    QueryDef(
      "q96_regex_stats",
      Some("""SELECT regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(len(regexp_extract_all(p_name, '[aeiou]'))) AS BIGINT) AS n_vowels,
        |  MIN(regexp_replace(p_name, '[aeiou]', '*', 'g')) AS sample_masked
        |FROM part GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "part")
          .groupBy(regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
            regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"))
          .agg(count(lit(1)).as("n_parts"),
            sum(expr("regexp_count(p_name, '[aeiou]')")).as("n_vowels"),
            min(regexp_replace(col("p_name"), "[aeiou]", "*")).as("sample_masked"))
          .orderBy("brand_num", "first_word")),

    // Window NAVIGATION functions — the frame-sensitive class q81's
    // distribution suite doesn't touch: first_value / last_value /
    // nth_value per customer over (order date, unique key). last_value is
    // deliberately graded over BOTH frames: the default frame (UNBOUNDED
    // PRECEDING..CURRENT ROW, where last_value degenerates to the current
    // row — the classic trap) and the explicit full-partition frame that
    // gives the intended "customer's final order". Windows partition by
    // customer, so every sort is per-partition and bounded.
    QueryDef(
      "q104_window_nav",
      Some("""SELECT o_orderkey, o_custkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price_default_frame,
        |  last_value(o_totalprice) OVER wf AS last_price,
        |  nth_value(o_totalprice, 2) OVER wf AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin),
      (spark, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            first(col("o_totalprice")).over(w).as("first_price"),
            last(col("o_totalprice")).over(w).as("last_price_default_frame"),
            last(col("o_totalprice")).over(wf).as("last_price"),
            nth_value(col("o_totalprice"), 2).over(wf).as("second_price"))
          .orderBy("o_orderkey")
      }),

    // Multiset set operators — EXCEPT ALL / INTERSECT ALL, where
    // MULTIPLICITY matters (q69 grades only the distinct variants): the
    // per-half customer order bags, so a customer with 3 orders before
    // the cut and 1 after contributes 2 rows to the h1 excess and 1 to
    // the common multiset. Spark plans these as a count-aggregate +
    // replicate-generate on the 8-byte key — never a driver-side set —
    // so the shuffle carries one (key, count) row per distinct key.
    QueryDef(
      "q105_multiset_ops",
      Some("""WITH h1 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        |h2 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |SELECT segment, CAST(n AS BIGINT) AS n_rows FROM (
        |  SELECT 'excess_pre' AS segment, COUNT(*) AS n
        |    FROM (SELECT * FROM h1 EXCEPT ALL SELECT * FROM h2)
        |  UNION ALL
        |  SELECT 'excess_post', COUNT(*)
        |    FROM (SELECT * FROM h2 EXCEPT ALL SELECT * FROM h1)
        |  UNION ALL
        |  SELECT 'common_multiset', COUNT(*)
        |    FROM (SELECT * FROM h1 INTERSECT ALL SELECT * FROM h2)
        |) ORDER BY segment""".stripMargin),
      (spark, dir) => {
        val o = t(spark, dir, "orders")
        val cut = lit("1998-01-01 00:00:00").cast("timestamp")
        val h1 = o.where(col("o_orderdate") < cut).select("o_custkey")
        val h2 = o.where(col("o_orderdate") >= cut).select("o_custkey")
        def seg(name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n_rows"))
            .select(lit(name).as("segment"), col("n_rows"))
        seg("excess_pre", h1.exceptAll(h2))
          .unionByName(seg("excess_post", h2.exceptAll(h1)))
          .unionByName(seg("common_multiset", h1.intersectAll(h2)))
          .orderBy("segment")
      }),

    // OUTER generator semantics (explode_outer / LATERAL VIEW OUTER): a
    // plain explode DROPS rows whose array is null — silently losing every
    // null-text document from a token pipeline; the outer variant emits
    // one null-token row instead. The raw corpora contain no null-text
    // docs (q56's vacuity problem), so BOTH sides plant one — lang 'xx',
    // id above every real id — making the null-carrier row non-vacuous at
    // grading time: regress explode_outer to explode and the 'xx' group
    // vanishes from the output. Graded per language so the oracle checks
    // the token fan-out AND that no document vanished. The generate is
    // row-local — fan-out is the output size, no shuffle before the
    // bounded (lang) aggregate.
    QueryDef(
      "q106_explode_outer",
      Some("""WITH docs AS (SELECT doc_id, lang, text FROM documents
        |  UNION ALL SELECT 1000000000001, 'xx', NULL),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM docs WHERE text IS NOT NULL)
        |SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_rows,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM docs LEFT JOIN toks USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin),
      (spark, dir) => {
        val planted = t(spark, dir, "documents").sparkSession.range(1)
          .select(lit(1000000000001L).as("doc_id"), lit("xx").as("lang"),
            lit(null).cast("string").as("text"))
        t(spark, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"))
          .unionByName(planted)
          .select(col("doc_id"), col("lang"),
            explode_outer(split(col("text"), " ")).as("tok"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_rows"),
            coalesce(sum(col("tok").isNull.cast("long")), lit(0L)).as("n_null_rows"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy("lang")
      }),

    // ANSI-safe try_* arithmetic: this engine runs with ANSI mode ON
    // (Spark 4 default), where /0, numeric overflow, and bad casts THROW —
    // the right default for a correctness-first engine, but an ingest
    // pipeline needs the explicit non-throwing forms. Grades the three
    // failure classes: try_divide (division by zero), try_cast (parse
    // failure), try_add (long overflow), each surfaced as a null count
    // the oracle recomputes relationally, plus one exact value aggregate
    // (price/4 stays on the 4dp grid, so the decimal money sum is
    // bit-stable). Row-local, scan-speed.
    QueryDef(
      "q107_try_arith",
      Some(s"""SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
        |  CAST(SUM(CASE WHEN TRY_CAST(o_orderstatus AS INT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_null,
        |  CAST(SUM(CASE WHEN o_orderkey > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_add_null,
        |  ${sqlMoneySum("o_totalprice / 4")} AS quarter_sum
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            coalesce(sum(expr("try_divide(o_totalprice, o_orderkey % 7)").isNull
              .cast("long")), lit(0L)).as("n_div_null"),
            coalesce(sum(expr("try_cast(o_orderstatus AS INT)").isNull
              .cast("long")), lit(0L)).as("n_cast_null"),
            coalesce(sum(expr("try_add(9223372036854775807L, o_orderkey)").isNull
              .cast("long")), lit(0L)).as("n_add_null"),
            moneySum(col("o_totalprice") / 4).as("quarter_sum"))
          .orderBy("o_orderpriority")),

    // Top-N per group — the "3 most expensive items per return flag"
    // shape — as a rank-filtered window, NOT a global sort: Spark 4's
    // InferWindowGroupLimit rewrites the row_number<=N filter into a
    // WindowGroupLimit that keeps only N rows per group PER MAP PARTITION
    // before the shuffle (PlanSpec asserts the node), so the exchange
    // moves at most N*partitions*groups rows instead of the fact table —
    // the difference between a working and a melted-down nightly top-k
    // at 100 TB. row_number (not rank) + full key tiebreak keeps the
    // result deterministic; oracle = QUALIFY with the same ordering.
    QueryDef(
      "q115_topn_per_group",
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  CAST(row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
        |FROM lineitem
        |QUALIFY rn <= 3
        |ORDER BY l_returnflag, rn""".stripMargin),
      (spark, dir) => topNPerGroup(t(spark, dir, "lineitem"))),

    // SCD Type 2 dimension build from a changelog — the versioned-history
    // counterpart of q98's keep-latest compaction: collapse consecutive
    // identical states (change detection via lag), then effective-date
    // each surviving version (valid_from / valid_to via lead, open-ended
    // current row). The canonical warehouse shape for "what was this
    // user's state on date D" queries. Scale shape: one shuffle on the
    // key; both window passes share the same (user_id, ts, event_id)
    // partitioning+sort, so Spark plans ONE exchange and per-key bounded
    // sorts — never a global sort; the change-collapse filter shrinks the
    // frame before the second window pass.
    QueryDef(
      "q120_scd2_dim",
      Some("""WITH c AS (SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (SELECT user_id, event_type, ts, event_id FROM c
        |  WHERE prev IS NULL OR event_type <> prev),
        |v AS (SELECT user_id, event_type AS state, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ts_to
        |  FROM ch)
        |SELECT user_id, CAST(version AS INT) AS version, state,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(ts_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  CAST(CASE WHEN ts_to IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin),
      (spark, dir) => scd2Dim(EventOps.events(spark, dir))),

    // Incremental materialized-view maintenance — the warehouse pattern
    // that makes 100 TB dashboards affordable: a persisted day×flag
    // aggregate is REFRESHED by merging the stored MV with the partial
    // aggregate of just the late-arriving delta slice, never by
    // re-scanning history. Correct because the MV state is chosen
    // algebraic: COUNT and exact DECIMAL SUMs merge by addition, and
    // non-additive report columns (avg) are DERIVED from merged sums at
    // read time. The oracle is the full rebuild over the logical table —
    // maintenance must be indistinguishable from recomputation.
    // Scale shape: the delta partial-agg is one map-side-combined
    // shuffle over ONLY the delta rows; the merge re-aggregates
    // (stored MV ∪ delta partials), both calendar×flag-bounded — at no
    // point does the maintenance path rescan the base facts.
    QueryDef(
      "q277_mv_maintain",
      Some(s"""SELECT CAST(l_shipdate AS DATE) AS day, l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  ${sqlMoneySum("l_quantity")} AS qty,
        |  ${sqlMoneySum("l_extendedprice")} AS revenue,
        |  (2 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 100
        |       AS BIGINT) + COUNT(*)) // (2 * COUNT(*)) AS avg_price_cents
        |FROM lineitem GROUP BY 1, 2 ORDER BY day, l_returnflag""".stripMargin),
      (spark, dir) =>
        mvIncrementalMaintain(spark, t(spark, dir, "lineitem"))))

  /** The q115 body, shared with PlanSpec's WindowGroupLimit assertion:
    * rank()/row_number() <= N predicates over a window are the ONLY
    * window shape Spark can push below the exchange (group-limit
    * inference), so this is the per-group top-k to reach for first; a
    * groupBy + sort_array alternative would shuffle every row.
    */
  def topNPerGroup(li: org.apache.spark.sql.DataFrame, n: Int = 3): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    li.select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= n)
      .orderBy("l_returnflag", "rn")
  }

  /** The q120 body, shared with AnalyticsSpec's planted fixture (same-ts
    * tie, single-event user, no-change run that must collapse to one
    * version) so an edit to the graded semantics breaks the unit test,
    * not just the oracle. Expects a changelog with (user_id, event_id,
    * event_type, ts); emits one effective-dated row per state CHANGE —
    * consecutive identical states collapse into the earlier version.
    */
  def scd2Dim(changes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    scd2Versions(changes)
      .select(col("user_id"), col("version"), col("state"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("ts_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        when(col("ts_to").isNull, 1).otherwise(0).cast("int").as("is_current"))
      .orderBy("user_id", "version")

  /** The q120 version-interval core with RAW microsecond timestamps —
    * shared by scd2Dim (which only adds presentation formatting) and the
    * q152 point-in-time lookup join (which needs exact-precision interval
    * bounds, not second-truncated strings). Emits (user_id, version,
    * state, ts, ts_to) where [ts, ts_to) intervals partition each user's
    * timeline from their first change onward.
    */
  def scd2Versions(changes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val changed = changes
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNull || col("event_type") =!= col("prev"))
    // second window over the collapsed frame: same partitioning, so the
    // exchange is reused; the sort re-runs only over surviving rows
    changed
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("ts_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"),
        col("event_type").as("state"), col("ts"), col("ts_to"))
  }

  /** q152 body (shared with AnalyticsSpec's boundary fixture): attribute
    * each purchase event to the SCD2 dimension version active at its
    * timestamp. The half-open [valid_from, valid_to) intervals partition
    * each user's timeline, so every purchase matches EXACTLY one version
    * (a purchase is itself a change candidate, so none precedes its
    * user's first version). Scale shape: equi-join on user_id with the
    * interval predicate as a residual condition — the dimension side is
    * per-user version rows (bounded), the fact side shuffles once.
    */
  def scd2Lookup(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dim = scd2Versions(events)
      .select(col("user_id").as("d_user"), col("version"), col("state"),
        col("ts").as("valid_from"), col("ts_to").as("valid_to"))
    events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .join(dim, col("user_id") === col("d_user") &&
        col("ts") >= col("valid_from") &&
        (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("version"), col("state"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
      .orderBy("event_id")
  }

  /** q168 body: land the changelog as four event-id-hash-interleaved
    * parquet files, run the streaming upsert over them one file per
    * micro-batch, and read the serving table back. Hash interleaving
    * (not time ranges) is deliberate: every micro-batch then spans the
    * whole time range, so later batches carry stragglers that are OLDER
    * than already-upserted state — the resurrection case the tombstone
    * retention exists for. Fresh temp dirs per run keep bench repeats
    * and verify reruns independent.
    */
  def upsertReplay(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-upsert-replay")
    val (landing, table, ckpt) =
      (s"$base/landing", s"$base/table", s"$base/ckpt")
    val ev = EventOps.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    ev.repartition(4, pmod(col("event_id"), lit(4)))
      .write.parquet(landing)
    graft.streaming.StreamingUpsert.upsertAvailableNow(
      spark, landing, table, ckpt, ev.schema,
      nBuckets = 8, maxFilesPerTrigger = Some(1))
      .awaitTermination()
    graft.streaming.StreamingUpsert.serve(spark, table).orderBy("user_id")
  }

  /** The q98 body, shared with AnalyticsSpec's planted-edge-case fixture
    * (same-ts tie, delete-then-reinsert) so an edit to the graded
    * semantics — the tie-break, the 'error'-as-delete filter — breaks the
    * unit test, not just the oracle. Expects a changelog with (user_id,
    * event_id, event_type, value, ts).
    */
  def cdcCompact(changes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    changes.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("last_type"),
        col("value").as("last_value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
      .orderBy("user_id")
  }

  /** q270 body: BITEMPORAL as-of — q238's valid-time travel crossed with
    * transaction time. Records become knowable only at their ARRIVAL
    * time (valid ts + a deterministic ingest lag of `event_id mod 5`
    * days — the late-data model), so "the state effective at V" has two
    * different answers: as KNOWN at transaction time TX (the report we
    * actually shipped that day) and as known NOW (after late rows
    * landed). Both answers run the same keep-latest/tombstone compaction
    * over differently-bounded changelogs; the full-outer join flags
    * every user whose shipped state was later REVISED — the restatement
    * audit a bitemporal warehouse exists to answer. V = min_ts + 10
    * days, TX = min_ts + 11 days (inside the 0-4 day lag spread, so the
    * revision set is non-trivially populated).
    *
    * Scale shape: two window compactions over time-pruned changelog
    * slices (each one user-keyed shuffle, frames bounded by per-key
    * change counts) and one user-keyed full-outer join; the cutoffs ride
    * in as broadcast scalars. Nothing global, nothing quadratic.
    */
  def bitemporalAsof(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cuts = ev.agg(
      (min(col("ts")) + expr("INTERVAL 10 DAYS")).as("v_cut"),
      (min(col("ts")) + expr("INTERVAL 11 DAYS")).as("tx_cut"))
    val arriving = ev
      .withColumn("arrival_ts", expr("ts + make_dt_interval(event_id % 5)"))
      .crossJoin(broadcast(cuts))
      .where(col("ts") <= col("v_cut"))
    val asKnownThen = cdcCompact(arriving
      .where(col("arrival_ts") <= col("tx_cut")))
      .select(col("user_id").as("t_user"), col("last_type").as("then_type"),
        col("last_ts").as("then_ts"))
    val asKnownNow = cdcCompact(arriving)
      .select(col("user_id").as("n_user"), col("last_type").as("now_type"),
        col("last_ts").as("now_ts"))
    asKnownThen
      .join(asKnownNow, col("t_user") === col("n_user"), "full_outer")
      .select(
        coalesce(col("t_user"), col("n_user")).as("user_id"),
        col("then_type"), col("then_ts"), col("now_type"), col("now_ts"),
        (!(col("then_type") <=> col("now_type") &&
          col("then_ts") <=> col("now_ts"))).as("revised"))
      .orderBy("user_id")
  }

  /** q141 body, shared with AnalyticsSpec's fixture test (the q98
    * lesson: the spec must drive the EXACT graded pipeline, not an
    * inline re-implementation). Expects (user_id, value) columns; cohort
    * A = even user ids. See the QueryDef comment for the exactness
    * argument.
    */
  def welchTTest(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cents = round(col("value") * 100, 0).cast("decimal(38,0)")
    val isA = col("user_id") % 2 === 0
    val zero = lit(0).cast("decimal(38,0)")
    val m = ev.agg(
      sum(when(isA, lit(1L)).otherwise(0L)).cast("decimal(38,0)").as("na"),
      sum(when(isA, cents).otherwise(zero)).as("sxa"),
      sum(when(isA, cents * cents).otherwise(zero)).as("sxxa"),
      sum(when(!isA, lit(1L)).otherwise(0L)).cast("decimal(38,0)").as("nb"),
      sum(when(!isA, cents).otherwise(zero)).as("sxb"),
      sum(when(!isA, cents * cents).otherwise(zero)).as("sxxb"))
    def d(c: String) = col(c).cast("double")
    m.select(
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      (d("sxa") / d("na")).as("mean_cents_a"),
      (d("sxb") / d("nb")).as("mean_cents_b"),
      ((d("sxa") / d("na") - d("sxb") / d("nb")) /
        sqrt(((d("na") * d("sxxa") - d("sxa") * d("sxa")) /
            (d("na") * (d("na") - lit(1.0)))) / d("na") +
          ((d("nb") * d("sxxb") - d("sxb") * d("sxb")) /
            (d("nb") * (d("nb") - lit(1.0)))) / d("nb"))).as("t_stat"))
  }

  /** q277 body, shared with AnalyticsSpec's planted late-delta fixture.
    * The MV state per (day, l_returnflag) is {COUNT, exact DECIMAL(18,4)
    * sums of quantity and price} — every column either additive or
    * derivable from additive ones, which is WHY the delta merge equals
    * the rebuild (decimal addition is exact and associative; a double
    * or avg column in the state would break both properties). The base
    * MV is genuinely persisted (write + re-read parquet — the state a
    * nightly job stores), the delta is partial-aggregated alone, and
    * the refresh re-aggregates only (stored MV ∪ delta partials): the
    * base facts are scanned ONCE at build time and never again.
    *
    * The late-arrival model makes the merge NON-disjoint on purpose:
    * rows with l_orderkey ≡ 7 (mod 10) arrive in the delta batch, so
    * nearly every (day, flag) key already materialized in the MV
    * receives additional mass — the merge exercises additivity on
    * every key, not a disjoint union of date ranges.
    */
  def mvIncrementalMaintain(spark: org.apache.spark.sql.SparkSession,
      li: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val keyed = li.select(to_date(col("l_shipdate")).as("day"),
      col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
      (col("l_orderkey") % 10 === 7).as("late"))
    def partials(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("day", "l_returnflag")
        .agg(count(lit(1)).as("n_lines"),
          sum(money(col("l_quantity"))).as("qty_sum"),
          sum(money(col("l_extendedprice"))).as("price_sum"))
    val loc = java.nio.file.Files.createTempDirectory("graft-mv").toString
    partials(keyed.where(!col("late")))
      .write.mode("overwrite").parquet(loc)
    val stored = spark.read.parquet(loc)
    stored.unionByName(partials(keyed.where(col("late"))))
      .groupBy("day", "l_returnflag")
      .agg(sum(col("n_lines")).as("n_lines"),
        sum(col("qty_sum")).as("qty_sum"),
        sum(col("price_sum")).as("price_sum"))
      .select(col("day"), col("l_returnflag"), col("n_lines"),
        round(col("qty_sum"), 2).cast("double").as("qty"),
        round(col("price_sum"), 2).cast("double").as("revenue"),
        // exact half-up integer cents: small groups land on .xx5
        // boundaries constantly, where double ROUND diverges across
        // engines (SURVEY §7.3) — (2s+n) div 2n is the same BIGINT on
        // both sides, no float anywhere
        expr("(2 * CAST(price_sum * 100 AS BIGINT) + n_lines)" +
          " DIV (2 * n_lines)").as("avg_price_cents"))
      .orderBy("day", "l_returnflag")
  }
}
