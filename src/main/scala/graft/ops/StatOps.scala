package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Tables._

/** Statistical profiling and maintenance-shaped analytics (SURVEY §7.4
  * extension tier): robust outlier detection, digit-distribution
  * profiling, inequality/concentration measures, incremental aggregate
  * maintenance, event-sequence transition matrices, and time-decayed
  * scoring.
  *
  * Exactness doctrine (the q97/q141 pattern): every sum that crosses a
  * shuffle runs on an integer/decimal grid (cents, shifted-integer
  * weights) so it is order-independent and engine-identical; doubles
  * appear only in a final projection where BOTH engines evaluate the
  * SAME expression tree over the SAME exact inputs, so every IEEE op
  * rounds identically.
  */
object StatOps {

  val defs: Seq[QueryDef] = Seq(
    // q231: WEIGHTED median — the robust center when rows carry
    // unequal mass (here: per-supplier unit price weighted by shipped
    // quantity; a plain median would let a 1-unit line outvote a
    // 50-unit line). Exact integer arithmetic end to end: weights are
    // integer units, the crossing rule picks min cents with
    // 2*cum_weight >= total (deterministic whatever the intra-cents
    // tie order — every same-cents row agrees on the cents value).
    // Per-supplier windows are bounded frames; one shuffle.
    QueryDef(
      "q231_weighted_median",
      Some("""WITH l AS (SELECT l_suppkey,
        |    CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
        |    CAST(l_quantity AS BIGINT) AS w FROM lineitem),
        |c AS (SELECT l_suppkey, cents, w,
        |    SUM(w) OVER (PARTITION BY l_suppkey
        |      ORDER BY cents, w ROWS UNBOUNDED PRECEDING) AS cumw,
        |    SUM(w) OVER (PARTITION BY l_suppkey) AS total FROM l)
        |SELECT l_suppkey, CAST(MAX(total) AS BIGINT) AS total_weight,
        |  CAST(MIN(CASE WHEN 2 * cumw >= total THEN cents END) AS BIGINT)
        |    AS median_cents
        |FROM c GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),
      (spark, dir) => weightedMedian(t(spark, dir, "lineitem"))),

    // Robust outlier detection via median absolute deviation: the
    // classic "3 sigma" rule done with medians so a single corrupt
    // batch cannot drag the threshold. Two bounded passes: per-type
    // median of cents (exact: interpolation of integers is a half-grid
    // value, exact in double), then per-type MAD over the derived
    // absolute deviations (quarter-grid, still exact). The per-type
    // stats frames are event_type-cardinality rows -> broadcast back;
    // the fact table streams through scan-speed. 4.4478 = 3 * 1.4826
    // (the normal-consistency constant) pre-folded to one literal so
    // both engines parse the identical double.
    QueryDef(
      "q143_mad_outliers",
      Some("""WITH c AS (SELECT event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |       WHERE value IS NOT NULL),
        |m AS (SELECT event_type, quantile_cont(cents, 0.5) AS med
        |      FROM c GROUP BY event_type),
        |d AS (SELECT c.event_type, m.med, abs(c.cents - m.med) AS dev
        |      FROM c JOIN m USING (event_type)),
        |a AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |      FROM d GROUP BY event_type)
        |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  d.med AS median_cents, a.mad AS mad_cents,
        |  CAST(SUM(CASE WHEN d.dev > 4.4478 * a.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM d JOIN a USING (event_type)
        |GROUP BY d.event_type, d.med, a.mad
        |ORDER BY d.event_type""".stripMargin),
      (spark, dir) => madOutliers(EventOps.events(spark, dir))),

    // Benford first-digit profile across money measures — the
    // fraud/corruption screen over ingested financial columns. The
    // digit comes from the decimal string of the exact cents integer
    // (no log10, whose libm rounding differs across engines); counts
    // are exact and the observed share is one double division. The
    // per-measure share window runs over <= 9 rows.
    QueryDef(
      "q144_benford",
      Some("""WITH u AS (
        |  SELECT 'o_totalprice' AS measure,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
        |  UNION ALL
        |  SELECT 'l_extendedprice',
        |         CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem),
        |g AS (SELECT measure,
        |        CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
        |        CAST(COUNT(*) AS BIGINT) AS n
        |      FROM u GROUP BY 1, 2)
        |SELECT measure, digit, n,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY measure) AS DOUBLE)
        |    AS share
        |FROM g ORDER BY measure, digit""".stripMargin),
      (spark, dir) => {
        val o = t(spark, dir, "orders").select(
          lit("o_totalprice").as("measure"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        val l = t(spark, dir, "lineitem").select(
          lit("l_extendedprice").as("measure"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
        o.unionByName(l)
          .withColumn("digit",
            substring(col("cents").cast("string"), 1, 1).cast("int"))
          .groupBy("measure", "digit").agg(count(lit(1)).as("n"))
          .withColumn("share", col("n").cast("double") /
            sum("n").over(Window.partitionBy("measure")).cast("double"))
          .orderBy("measure", "digit")
      }),

    // Revenue concentration: Gini coefficient + top-decile share over
    // per-customer revenue. Gini via the rank formula
    // (2*Sum(i*x_i) - (n+1)*Sum(x)) / (n*Sum(x)) with x sorted asc and
    // ties broken by custkey — every moment accumulates in decimal
    // cents (exact, order-independent), the two divisions happen once
    // on identical doubles. The unpartitioned rank window runs over the
    // CUSTOMER AGGREGATE (dimension-bounded, q92 doctrine), never the
    // fact table; at 1000x the frame is |customers| rows, not |orders|.
    QueryDef(
      "q145_concentration",
      Some("""WITH r AS (SELECT o_custkey,
        |         SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS cents
        |       FROM orders GROUP BY o_custkey),
        |k AS (SELECT cents,
        |        ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
        |        COUNT(*) OVER () AS n
        |      FROM r)
        |SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents,
        |  CAST(2 * SUM(cents * i) - (MAX(n) + 1) * SUM(cents) AS DOUBLE)
        |    / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE)) AS gini,
        |  CAST(SUM(CASE WHEN i > n - (n + 9) // 10 THEN cents ELSE 0 END)
        |      AS DOUBLE)
        |    / CAST(SUM(cents) AS DOUBLE) AS top_decile_share
        |FROM k""".stripMargin),
      (spark, dir) => concentration(t(spark, dir, "orders"))),

    // Incremental aggregate maintenance: the 100 TB pattern where the
    // nightly gold table is NEVER recomputed from scratch — per-group
    // partial states (count, exact decimal sum, max) are mergeable
    // monoids, so state(old) merged with state(new-batch) must equal
    // the full recompute, which is exactly what the oracle grades (it
    // recomputes from all rows; the engine only merges partials).
    // Decimal sums make the merge exact, hence order- and
    // batching-insensitive.
    QueryDef(
      "q146_incr_agg_state",
      Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS total_price,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    / COUNT(*), 2) AS avg_price,
        |  strftime(MAX(o_orderdate), '%Y-%m-%d') AS latest_order
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (spark, dir) => {
        val orders = t(spark, dir, "orders")
        val old = orders.filter(col("o_orderkey") % 10 =!= 0)
        val batch = orders.filter(col("o_orderkey") % 10 === 0)
        mergeAggState(aggState(old).unionByName(aggState(batch)))
      }),

    // Event-sequence transition matrix (first-order Markov): for each
    // (prev_type -> type) pair, the count and conditional probability.
    // The lag window shuffles once on user_id (the natural key — scales
    // with users); counts are exact and each probability is one double
    // division. Ties at identical timestamps break on event_id so the
    // sequence is deterministic on both engines.
    QueryDef(
      "q147_markov_transitions",
      Some("""WITH s AS (SELECT event_type,
        |         LAG(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_type
        |       FROM events),
        |g AS (SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type)
        |    AS DOUBLE) AS p
        |FROM g ORDER BY prev_type, event_type""".stripMargin),
      (spark, dir) => markovTransitions(EventOps.events(spark, dir))),

    // Half-life time-decayed engagement score: score(u) = sum over u's
    // last-30-day events of value * 2^(-days_behind) — the recency
    // weighting every ranking/retention model wants. Kept EXACT by
    // integer scaling: value_cents * 2^(30-d) accumulates in decimal
    // (d in [0,30], so the weight is an exact power-of-two long), and
    // one final division by the constant 100*2^30 lands the true score.
    // The global high-water day rides in as a broadcast one-row frame.
    QueryDef(
      "q148_decayed_score",
      Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |         CAST(round(value * 100) AS HUGEINT) AS cents FROM events),
        |m AS (SELECT MAX(day) AS max_day FROM e),
        |f AS (SELECT user_id, cents,
        |        date_diff('day', day, max_day) AS d
        |      FROM e, m WHERE date_diff('day', day, max_day) <= 30)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(cents * (1::HUGEINT << (30 - d))) AS DOUBLE)
        |    / 107374182400.0 AS decayed_score
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin),
      (spark, dir) => decayedScore(EventOps.events(spark, dir))),

    // Contingency table with chi-square contributions: is event mix
    // independent of the A/B cohort? Observed counts are exact; margins
    // come from integer window sums over the CELL frame (cohorts ×
    // types rows, not the fact table); expected = row*col/N and the
    // per-cell (O-E)^2/E run in double over identical exact inputs.
    // Deliberately emits PER-CELL contributions, not the summed
    // statistic: a cross-row double sum would be addition-order
    // dependent, per-cell values are bit-stable on both engines (the
    // q141 Welch test covers the scalar-statistic form).
    QueryDef(
      "q151_chi_square_cells",
      Some("""WITH cells AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS cohort,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT cohort, event_type, n,
        |  CAST(SUM(n) OVER (PARTITION BY cohort) AS DOUBLE)
        |    * CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
        |    / CAST(SUM(n) OVER () AS DOUBLE) AS expected,
        |  (CAST(n AS DOUBLE) - CAST(SUM(n) OVER (PARTITION BY cohort) AS DOUBLE)
        |      * CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
        |      / CAST(SUM(n) OVER () AS DOUBLE))
        |  * (CAST(n AS DOUBLE) - CAST(SUM(n) OVER (PARTITION BY cohort) AS DOUBLE)
        |      * CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
        |      / CAST(SUM(n) OVER () AS DOUBLE))
        |  / (CAST(SUM(n) OVER (PARTITION BY cohort) AS DOUBLE)
        |      * CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
        |      / CAST(SUM(n) OVER () AS DOUBLE)) AS chi_contrib
        |FROM cells ORDER BY cohort, event_type""".stripMargin),
      (spark, dir) => contingencyChi(EventOps.events(spark, dir))),

    // Transition think-time: for each (prev -> next) event-type pair, how
    // long users pause between them (median). The q147 lag window plus
    // the q49 exact-interpolation median over INTEGER second gaps
    // (epoch-ms difference, integer-divided by 1000 — exact on both
    // engines; interpolating integers lands on the half grid, exact in
    // double). One shuffle on user_id, then a type-pair-cardinality agg.
    QueryDef(
      "q153_transition_time",
      Some("""WITH s AS (SELECT user_id, event_type, ts, event_id,
        |    LAG(event_type) OVER w AS prev_type,
        |    LAG(epoch_ms(ts)) OVER w AS prev_ms,
        |    epoch_ms(ts) AS ms
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  quantile_cont((ms - prev_ms) // 1000, 0.5) AS median_gap_s
        |FROM s WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, event_type""".stripMargin),
      (spark, dir) => transitionTime(EventOps.events(spark, dir))),

    // Exact distinct via bitmap aggregation — the EXACT counterpart of
    // the q41 HLL tier. Dense integer keys bucket into 32k-bit bitmaps
    // (bitmap_bucket_number / bitmap_bit_position), each (group, bucket)
    // builds its bitmap map-side, and popcounts sum to the exact
    // distinct count. At 100 TB this is how warehouses keep exact
    // uniques affordable: the shuffle carries fixed-size bitmaps, not
    // user ids, and bucket bitmaps merge by OR (associative, so partial
    // aggregation applies). Graded against the naive COUNT(DISTINCT) —
    // the bitmap path must be EXACTLY equal, not approximately.
    QueryDef(
      "q156_bitmap_distinct",
      Some("""SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (spark, dir) => bitmapDistinct(EventOps.events(spark, dir))),

    // Incremental exact distinct: per-DAY bitmap states OR-merged over a
    // trailing 14-day window — the exact-arithmetic twin of q84's HLL
    // union algebra. A nightly pipeline materializes one bitmap per
    // (group, day, bucket); "distinct users last N days" then merges N
    // small states (bitmap_or_agg) instead of rescanning N days of raw
    // events, and unlike HLL the answer is EXACT. Graded against naive
    // COUNT(DISTINCT) over the same window.
    QueryDef(
      "q157_bitmap_rollup",
      Some("""WITH m AS (SELECT MAX(CAST(ts AS DATE)) AS mx FROM events)
        |SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_recent
        |FROM events, m
        |WHERE CAST(ts AS DATE) >= mx - 14
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (spark, dir) => bitmapRollup(EventOps.events(spark, dir))),

    // Fulfillment-lag percentiles: order date -> line ship date, exact
    // integer day gaps through a fact-fact equi-join, p50/p90 by the
    // q49 interpolation rule (exact on integer inputs). The join
    // shuffles both sides once on the order key; the percentile state is
    // per-priority. The logistics-SLA query every ops dashboard runs.
    QueryDef(
      "q158_fulfillment_lag",
      Some("""WITH l AS (SELECT o.o_orderpriority,
        |    date_diff('day', o.o_orderdate, li.l_shipdate) AS lag_d
        |  FROM orders o JOIN lineitem li ON o.o_orderkey = li.l_orderkey)
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  quantile_cont(lag_d, 0.5) AS p50_days,
        |  quantile_cont(lag_d, 0.9) AS p90_days,
        |  CAST(MAX(lag_d) AS BIGINT) AS max_days
        |FROM l GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (spark, dir) => {
        val lag = t(spark, dir, "orders")
          .join(t(spark, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderpriority"),
            datediff(col("l_shipdate"), col("o_orderdate")).as("lag_d"))
        lag.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_lines"),
            expr("percentile(lag_d, 0.5d)").as("p50_days"),
            expr("percentile(lag_d, 0.9d)").as("p90_days"),
            max(col("lag_d")).cast("long").as("max_days"))
          .orderBy("o_orderpriority")
      }),

    // Frequency-of-frequencies (order-size distribution): how many
    // orders have k lines — two CHAINED aggregations, the Good-Turing /
    // degree-distribution primitive. The second agg runs over the
    // already-collapsed per-order frame, and its key cardinality is the
    // max basket size (tiny), so the second shuffle is trivial at any
    // scale.
    QueryDef(
      "q159_order_size_dist",
      Some("""WITH c AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM c GROUP BY n_lines ORDER BY n_lines""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "lineitem")
          .groupBy("l_orderkey").agg(count(lit(1)).as("n_lines"))
          .groupBy("n_lines").agg(count(lit(1)).as("n_orders"))
          .orderBy("n_lines")),

    // Month-over-month revenue trend: absolute delta, growth rate, and
    // cumulative share — the BI trend triple. Every sum is an exact
    // decimal (monthly partials, the running cumulative over the
    // deterministic month order, and the grand total via an unbounded
    // frame), so lag deltas and both divisions run over identical exact
    // inputs on both engines. All windows live on the MONTH frame
    // (calendar-bounded ~84 rows), never the fact table.
    QueryDef(
      "q161_revenue_trend",
      Some("""WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT month, CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
        |  CAST(ROUND(rev - LAG(rev) OVER (ORDER BY month), 2) AS DOUBLE)
        |    AS delta,
        |  CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE)
        |    / CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS growth,
        |  CAST(SUM(rev) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING)
        |      AS DOUBLE)
        |    / CAST(SUM(rev) OVER () AS DOUBLE) AS cum_share
        |FROM m ORDER BY month""".stripMargin),
      (spark, dir) => {
        val w = Window.orderBy("month")
        val m = t(spark, dir, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(sum(money(col("o_totalprice"))).as("rev"))
        m.select(col("month"),
          round(col("rev"), 2).cast("double").as("revenue"),
          round(col("rev") - lag(col("rev"), 1).over(w), 2).cast("double")
            .as("delta"),
          ((col("rev") - lag(col("rev"), 1).over(w)).cast("double") /
            lag(col("rev"), 1).over(w).cast("double")).as("growth"),
          (sum(col("rev")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).cast("double") /
            sum(col("rev")).over(Window.partitionBy()).cast("double"))
            .as("cum_share"))
          .orderBy("month")
      }),

    // Mergeable equi-width histogram quantile estimates: the
    // distributed-quantile primitive for when exact interpolation
    // (q49/q158) is too expensive — per-DAY 64-bin count states merge by
    // plain addition into the global histogram (associative, so the
    // merge tree can follow any partitioning; the Spark side DELIBERATELY
    // routes through the per-day states while the oracle aggregates
    // directly — equal results ARE the mergeability proof), then p50/p90/
    // p99 interpolate inside the located bin. Exactness: bins, cumulative
    // counts and target ranks are all BIGINT; doubles appear only in the
    // final interpolation where both engines evaluate the same expression
    // tree over the same integers. The cumulative window runs over the
    // 64-row bin frame (fixed by construction -> PlanSpec allowlist).
    QueryDef(
      "q188_hist_quantiles",
      Some("""WITH cents AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |b AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi, COUNT(*) AS n
        |      FROM cents),
        |binned AS (SELECT LEAST(63, ((c.cents - b.lo) * 64)
        |             // (b.hi - b.lo + 1)) AS bin
        |           FROM cents c, b),
        |h AS (SELECT bin, COUNT(*) AS cnt FROM binned GROUP BY bin),
        |ch AS (SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum,
        |         COALESCE(SUM(cnt) OVER (ORDER BY bin
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS cumb
        |       FROM h),
        |qs(q, num, den) AS (VALUES ('p50', 1, 2), ('p90', 9, 10),
        |                           ('p99', 99, 100)),
        |t AS (SELECT q, (b.n * num + den - 1) // den AS t, b.lo, b.hi
        |      FROM qs, b)
        |SELECT t.q, CAST(ch.bin AS INT) AS bin,
        |  t.lo + (ch.bin * (t.hi - t.lo + 1)) // 64 AS lo_cents,
        |  t.t AS target_rank, CAST(ch.cum AS BIGINT) AS cum_count,
        |  CAST(t.lo + (ch.bin * (t.hi - t.lo + 1)) // 64 AS DOUBLE)
        |    + (CAST(t.t - ch.cumb AS DOUBLE) / CAST(ch.cnt AS DOUBLE))
        |      * (CAST(t.hi - t.lo + 1 AS DOUBLE) / 64.0) AS est_cents
        |FROM t JOIN ch ON ch.cum >= t.t AND ch.cumb < t.t
        |ORDER BY q""".stripMargin),
      (spark, dir) => histQuantiles(t(spark, dir, "orders"))),

    // Winsorization (q197): clip each event type's value at its exact
    // p05/p95 and report the clip counts plus the winsorized mean — the
    // robust-mean counterpart of q143's MAD outlier flagging (clip,
    // don't drop). q143's shape exactly: per-type percentiles of the
    // cents integers (exact half-grid interpolation, quantile_cont ==
    // Spark percentile on an integer grid) broadcast back over a
    // scan-speed clip pass; sums of clipped cents stay BIGINT across
    // the shuffle and the mean is ONE final shared double division.
    QueryDef(
      "q197_winsorize",
      Some("""WITH c AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |  WHERE value IS NOT NULL),
        |q AS (SELECT event_type, quantile_cont(cents, 0.05) AS lo,
        |    quantile_cont(cents, 0.95) AS hi
        |  FROM c GROUP BY event_type),
        |w AS (SELECT c.event_type, q.lo, q.hi,
        |    CASE WHEN c.cents < q.lo THEN 1 ELSE 0 END AS clip_lo,
        |    CASE WHEN c.cents > q.hi THEN 1 ELSE 0 END AS clip_hi,
        |    CAST(round(LEAST(GREATEST(CAST(c.cents AS DOUBLE), q.lo), q.hi)
        |      * 20) AS BIGINT) AS t_cents
        |  FROM c JOIN q USING (event_type))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  lo AS lo_cents, hi AS hi_cents,
        |  CAST(SUM(clip_lo) AS BIGINT) AS n_clipped_lo,
        |  CAST(SUM(clip_hi) AS BIGINT) AS n_clipped_hi,
        |  CAST(SUM(t_cents) AS DOUBLE) / (20.0 * COUNT(*))
        |    AS winsorized_mean_cents
        |FROM w GROUP BY event_type, lo, hi ORDER BY event_type""".stripMargin),
      (spark, dir) => winsorize(EventOps.events(spark, dir))),

    // Per-group percentile profile (q203): the q49/q143 exact
    // interpolation, grouped — p25/p50/p75 of document length per
    // language, the length-profile table a curation run reads before
    // setting chunking and packing parameters. Integer-grid percentiles
    // are quarter-grid values (exact in double, quantile_cont ==
    // percentile — the q158 parity); one shuffle on the group key,
    // group frames are language-cardinality-bounded.
    QueryDef(
      "q203_group_percentiles",
      Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  quantile_cont(n_chars, 0.25) AS p25,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.75) AS p75
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY lang ORDER BY lang""".stripMargin),
      (spark, dir) =>
        t(spark, dir, "documents").where(col("text").isNotNull)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            expr("percentile(n_chars, 0.25d)").as("p25"),
            expr("percentile(n_chars, 0.5d)").as("p50"),
            expr("percentile(n_chars, 0.75d)").as("p75"))
          .orderBy("lang")),

    // First-seen adoption curve (q204): each user's first event day,
    // then per-day new-user counts with the cumulative total — growth
    // analytics' canonical chart, and the q157 complement (windowed
    // distinct asks "active"; this asks "ever seen by day d"). One
    // shuffle on user_id for the min, one calendar-keyed count; the
    // cumulative window runs over the day frame (calendar-bounded,
    // PlanSpec allowlist).
    QueryDef(
      "q204_adoption_curve",
      Some("""WITH f AS (SELECT user_id,
        |    MIN(CAST(ts AS DATE)) AS first_day
        |  FROM events GROUP BY user_id),
        |d AS (SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS n_new
        |  FROM f GROUP BY first_day)
        |SELECT strftime(day, '%Y-%m-%d') AS day, n_new,
        |  CAST(SUM(n_new) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM d ORDER BY day""".stripMargin),
      (spark, dir) => {
        val f = EventOps.events(spark, dir)
          .groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("first_day"))
        f.groupBy(col("first_day").as("day"))
          .agg(count(lit(1)).as("n_new"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_new"),
            sum(col("n_new")).over(Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("cum_users"))
          .orderBy("day")
      }))

  /** q197 body (shared with StatsSpec's hand fixture). Interpolating
    * integer cents at p05/p95 lands thresholds on the 1/20 grid, so
    * clipped values scale to integers by x20 — via round(), NOT a raw
    * cast (Spark's double->long cast truncates where DuckDB's rounds;
    * and 0.05 steps are not binary-exact, so truncation could fall
    * either side of the integer). round() on a value within ulps of the
    * grid point is exact in both engines; the sums then cross shuffles
    * as BIGINT and ONE shared double division ends the query.
    */
  def winsorize(events: DataFrame): DataFrame = {
    val c = events.where(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val q = c.groupBy("event_type")
      .agg(expr("percentile(cents, 0.05d)").as("lo"),
        expr("percentile(cents, 0.95d)").as("hi"))
    c.join(broadcast(q), Seq("event_type"))
      .select(col("event_type"), col("lo"), col("hi"),
        when(col("cents") < col("lo"), 1L).otherwise(0L).as("clip_lo"),
        when(col("cents") > col("hi"), 1L).otherwise(0L).as("clip_hi"),
        round(least(greatest(col("cents").cast("double"), col("lo")),
          col("hi")) * 20).cast("long").as("t_cents"))
      .groupBy(col("event_type"), col("lo").as("lo_cents"),
        col("hi").as("hi_cents"))
      .agg(count(lit(1)).as("n"),
        sum(col("clip_lo")).as("n_clipped_lo"),
        sum(col("clip_hi")).as("n_clipped_hi"),
        (sum(col("t_cents")).cast("double") / (lit(20.0) * count(lit(1))))
          .as("winsorized_mean_cents"))
      .select(col("event_type"), col("n"), col("lo_cents"), col("hi_cents"),
        col("n_clipped_lo"), col("n_clipped_hi"),
        col("winsorized_mean_cents"))
      .orderBy("event_type")
  }

  /** q188 body (shared with StatsSpec's merge-equivalence fixture). */
  def histQuantiles(orders: DataFrame): DataFrame = {
    val cents = orders.select(
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      to_date(col("o_orderdate")).as("d"))
    val bounds = cents.agg(min(col("cents")).as("lo"),
      max(col("cents")).as("hi"), count(lit(1)).as("n"))
    val binned = cents.crossJoin(broadcast(bounds))
      .select(col("d"),
        expr("least(63L, ((cents - lo) * 64) div (hi - lo + 1))").as("bin"))
    // per-day partial states (the mergeable sketch), then the merge
    val dayStates = binned.groupBy("d", "bin").agg(count(lit(1)).as("cnt"))
    val merged = dayStates.groupBy("bin").agg(sum(col("cnt")).as("cnt"))
    val binW = Window.orderBy("bin")
    val ch = merged.select(col("bin"), col("cnt"),
      sum(col("cnt")).over(binW).as("cum"),
      coalesce(sum(col("cnt")).over(
          binW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("cumb"))
    val qs = bounds.sparkSession.sql(
      "SELECT * FROM VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)" +
        " AS qs(q, num, den)")
    val targets = qs.crossJoin(broadcast(bounds))
      .select(col("q"), expr("(n * num + den - 1) div den").as("t"),
        col("lo"), col("hi"))
    targets.join(broadcast(ch), col("cum") >= col("t") && col("cumb") < col("t"))
      .select(col("q"), col("bin").cast("int").as("bin"),
        expr("lo + (bin * (hi - lo + 1)) div 64").as("lo_cents"),
        col("t").as("target_rank"), col("cum").as("cum_count"),
        (expr("CAST(lo + (bin * (hi - lo + 1)) div 64 AS DOUBLE)") +
          (col("t") - col("cumb")).cast("double") / col("cnt").cast("double") *
            (expr("CAST(hi - lo + 1 AS DOUBLE)") / lit(64.0)))
          .as("est_cents"))
      .orderBy("q")
  }

  /** q143 body (shared with StatsSpec's planted-outlier fixture).
    * Expects (event_type, value); emits per-type robust stats + outlier
    * count at the 3-sigma-equivalent MAD threshold.
    */
  def madOutliers(ev: DataFrame): DataFrame = {
    val c = ev.filter(col("value").isNotNull).select(col("event_type"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    val med = c.groupBy("event_type")
      .agg(expr("percentile(cents, 0.5d)").as("med"))
    val d = c.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("cents") - col("med")))
    val mad = d.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5d)").as("mad"))
    d.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("event_type"), col("n"), col("med").as("median_cents"),
        col("mad").as("mad_cents"), col("n_outliers"))
      .orderBy("event_type")
  }

  /** q231 body (shared with AuditSpec's hand-weighted fixtures): exact
    * per-supplier weighted median — min cents where 2·cum_weight ≥
    * total (lower-median convention; deterministic whatever the
    * intra-cents tie order, since every same-cents row agrees on the
    * selected value).
    */
  def weightedMedian(lineitem: DataFrame): DataFrame = {
    val l = lineitem.select(col("l_suppkey"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
      col("l_quantity").cast("long").as("w"))
    val wCum = Window.partitionBy("l_suppkey").orderBy(col("cents"), col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.withColumn("cumw", sum(col("w")).over(wCum))
      .withColumn("total",
        sum(col("w")).over(Window.partitionBy("l_suppkey")))
      .groupBy("l_suppkey")
      .agg(max(col("total")).cast("long").as("total_weight"),
        min(when(lit(2) * col("cumw") >= col("total"), col("cents")))
          .cast("long").as("median_cents"))
      .orderBy("l_suppkey")
  }

  /** q145 body (shared with StatsSpec's equality / single-owner
    * fixtures). Expects orders-shaped (o_custkey, o_totalprice) columns.
    *
    * The Gini rank is the q92 two-phase distributed rank, NOT a naive
    * `row_number() OVER (ORDER BY cents)`: the per-customer aggregate
    * grows with the data, and a single unpartitioned window would drag
    * billions of rows through one task at 100 TB. Shard key =
    * `floor(log1p(cents) * 64)` — deterministic (no data-dependent cut
    * points that could recompute differently on a retried branch),
    * MONOTONIC in cents (so (shard, cents, custkey) order equals
    * (cents, custkey) order and the composed rank is exactly the global
    * one), and bounded (≤8192 cells; ~1.6% relative-value bands, so a
    * smooth revenue distribution spreads evenly). Per-shard row_numbers
    * run in parallel; the only unpartitioned window left runs over the
    * ≤8192-row shard-count frame (bounded by construction — PlanSpec's
    * window sweep allowlists exactly this class).
    */
  def concentration(orders: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val rev = orders
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast(dec)).as("cents"))
    val keyed = rev.withColumn("shard",
      least(lit(8191), greatest(lit(0),
        floor(log1p(col("cents").cast("double")) * 64))).cast("int"))
    val offsets = keyed.groupBy("shard").agg(count(lit(1)).as("cnt"))
      .select(col("shard"),
        coalesce(sum(col("cnt")).over(
          Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("off"),
        sum(col("cnt")).over(Window.partitionBy()).as("n"))
    val wIn = Window.partitionBy("shard").orderBy(col("cents"), col("o_custkey"))
    val ranked = keyed.join(broadcast(offsets), Seq("shard"))
      .withColumn("i", col("off") + row_number().over(wIn))
    ranked.agg(
      max(col("n")).as("n_customers"),
      sum(col("cents")).cast("long").as("total_cents"),
      ((lit(2).cast(dec) * sum(col("cents") * col("i").cast(dec)) -
        (max(col("n")) + 1).cast(dec) * sum(col("cents"))).cast("double") /
        (max(col("n")).cast("double") * sum(col("cents")).cast("double")))
        .as("gini"),
      (sum(when(col("i") > col("n") - expr("(n + 9) div 10"), col("cents"))
        .otherwise(lit(0).cast(dec))).cast("double") /
        sum(col("cents")).cast("double")).as("top_decile_share"))
  }

  /** Mergeable per-group aggregate state for q146: count + exact decimal
    * sum + max form a commutative monoid, so any batching of the input
    * merges to the same state.
    */
  def aggState(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderpriority").agg(
      count(lit(1)).as("n_part"),
      sum(money(col("o_totalprice"))).as("sum_part"),
      max(col("o_orderdate")).as("max_part"))

  /** Merge a union of q146 partial states and finalize presentation
    * columns. Merging is the SAME monoid ops over the partials.
    */
  def mergeAggState(states: DataFrame): DataFrame =
    states.groupBy("o_orderpriority")
      .agg(sum(col("n_part")).as("n"),
        sum(col("sum_part")).as("total"),
        max(col("max_part")).as("latest"))
      .select(col("o_orderpriority"), col("n"),
        round(col("total"), 2).cast("double").as("total_price"),
        round(col("total").cast("double") / col("n"), 2).as("avg_price"),
        date_format(col("latest"), "yyyy-MM-dd").as("latest_order"))
      .orderBy("o_orderpriority")

  /** q151 body (shared with StatsSpec's hand-computed 2x2 fixture).
    * The expected/chi_contrib doubles are built from ONE shared expected
    * expression so Spark's projection matches the oracle's repeated text
    * op-for-op.
    */
  def contingencyChi(ev: DataFrame): DataFrame = {
    val cells = ev
      .withColumn("cohort",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy("cohort", "event_type").agg(count(lit(1)).as("n"))
    val rowN = sum("n").over(Window.partitionBy("cohort")).cast("double")
    val colN = sum("n").over(Window.partitionBy("event_type")).cast("double")
    val totN = sum("n").over(Window.partitionBy()).cast("double")
    val expected = rowN * colN / totN
    val o = col("n").cast("double")
    cells.select(col("cohort"), col("event_type"), col("n"),
      expected.as("expected"),
      ((o - expected) * (o - expected) / expected).as("chi_contrib"))
      .orderBy("cohort", "event_type")
  }

  /** q147 body (shared with StatsSpec's hand-computed chain fixture). */
  def markovTransitions(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum("n").over(Window.partitionBy("prev_type")).cast("double"))
      .orderBy("prev_type", "event_type")
  }

  /** q156 body (shared with StatsSpec's bucket-boundary fixture): exact
    * distinct keys per group through 32k-bit bucketed bitmaps.
    */
  def bitmapDistinct(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
      expr("bitmap_bucket_number(user_id)").as("buck"),
      expr("bitmap_bit_position(user_id)").as("pos"))
      .groupBy("event_type", "buck")
      .agg(expr("bitmap_construct_agg(pos)").as("bm"))
      .groupBy("event_type")
      .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_users"))
      .orderBy("event_type")

  /** q157's daily state build: one bitmap per (event_type, day, bucket) —
    * what a nightly job would persist. Shared with the rollup and the
    * StatsSpec cross-day-dedup fixture.
    */
  def dailyBitmapState(ev: DataFrame): DataFrame =
    ev.select(col("event_type"), to_date(col("ts")).as("day"),
      expr("bitmap_bucket_number(user_id)").as("buck"),
      expr("bitmap_bit_position(user_id)").as("pos"))
      .groupBy("event_type", "day", "buck")
      .agg(expr("bitmap_construct_agg(pos)").as("bm"))

  /** q157 body: OR-merge the trailing-14-day daily states and popcount.
    * The raw table is touched ONLY by the state build; the rollup works
    * on states.
    */
  def bitmapRollup(ev: DataFrame, windowDays: Int = 14): DataFrame = {
    val states = dailyBitmapState(ev)
    val maxd = states.agg(max(col("day")).as("max_day"))
    states.crossJoin(broadcast(maxd))
      .where(col("day") >= date_sub(col("max_day"), windowDays))
      .groupBy("event_type", "buck")
      .agg(expr("bitmap_or_agg(bm)").as("merged"))
      .groupBy("event_type")
      .agg(sum(expr("bitmap_count(merged)")).cast("long").as("n_users_recent"))
      .orderBy("event_type")
  }

  /** q153 body (shared with StatsSpec's hand-computed gaps fixture). */
  def transitionTime(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev.withColumn("ms", expr("unix_millis(ts)"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .withColumn("gap_s", expr("(ms - prev_ms) div 1000"))
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"),
        expr("percentile(gap_s, 0.5d)").as("median_gap_s"))
      .orderBy("prev_type", "event_type")
  }

  /** q148 body (shared with StatsSpec's exact-powers fixture). */
  def decayedScore(ev: DataFrame): DataFrame = {
    val e = ev.select(col("user_id"), to_date(col("ts")).as("day"),
      round(col("value") * 100, 0).cast("decimal(38,0)").as("cents"))
    val maxd = e.agg(max(col("day")).as("max_day"))
    e.crossJoin(broadcast(maxd))
      .withColumn("d", datediff(col("max_day"), col("day")))
      .filter(col("d") <= 30)
      .withColumn("wcents",
        col("cents") * expr("shiftleft(CAST(1 AS BIGINT), 30 - d)").cast("decimal(38,0)"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("wcents")).as("num"))
      .select(col("user_id"), col("n_events"),
        (col("num").cast("double") / lit(107374182400.0)).as("decayed_score"))
      .orderBy("user_id")
  }
}
